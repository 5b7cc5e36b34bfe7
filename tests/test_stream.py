"""W-streamed Pallas NMF kernel parity (interpret mode on CPU).

ops/pallas_stream.py covers gene blocks too wide for the VMEM-resident
kernel (ops/pallas_nmf.py); its semantic reference is the plain XLA
lowering in core/nmf.py::nmf_masked, which these tests compare against.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from degnorm_tpu.core.nmf import nmf_masked
from degnorm_tpu.ops.pallas_stream import (_CHUNK_W, nmf_masked_streamed,
                                           streamed_supported)
from tests.conftest import random_coverage
from tests.test_core_parity import make_bucket


def wide_bucket(rng, n_genes, p, W, degrade_every=2):
    mats = []
    for i in range(n_genes):
        L = int(rng.integers(W // 2, W + 1))
        mats.append(random_coverage(rng, p, L,
                                    degraded=(i % degrade_every == 0)
                                    ).astype(np.float32))
    return make_bucket(mats, W, dtype=np.float32)


def test_streamed_supported_gate():
    assert streamed_supported((8, 32, 2 * _CHUNK_W), np.float32)
    # non-multiple widths fall back to a single whole-row chunk
    assert streamed_supported((8, 32, _CHUNK_W + 128), np.float32)
    assert not streamed_supported((8, 32, _CHUNK_W + 64), np.float32)
    assert not streamed_supported((8, 32, 2 * _CHUNK_W), np.float64)
    assert not streamed_supported((8, 200, 2 * _CHUNK_W), np.float32)


def test_streamed_matches_xla():
    rng = np.random.default_rng(60)
    F, mask = wide_bucket(rng, 10, 4, 2 * _CHUNK_W)
    kw = dict(nmf_iter=8, power_iters_cold=60, power_iters_warm=10)
    K1, E1, u1 = nmf_masked(F, mask, **kw)
    K2, E2, u2 = nmf_masked_streamed(F, mask, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=1e-4, atol=1e-5)


def test_streamed_warm_modes():
    """packed Gram + plain warm-restart power steps stay inside the
    bf16-product tolerance class (PARITY.md known deviation 5)."""
    rng = np.random.default_rng(61)
    F, mask = wide_bucket(rng, 8, 8, 2 * _CHUNK_W)
    kw = dict(nmf_iter=8, power_iters_cold=60, power_iters_warm=12)
    K1, E1, _ = nmf_masked(F, mask, **kw)
    K2, E2, _ = nmf_masked_streamed(F, mask, interpret=True,
                                    gram_mode="packed",
                                    power_warm_plain=4, **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=5e-3, atol=5e-3)


def test_streamed_gene_active_zeroes_skipped_blocks():
    rng = np.random.default_rng(62)
    F, mask = wide_bucket(rng, 16, 4, _CHUNK_W)
    act = np.zeros(16, bool)
    act[:8] = True  # second 8-gene grid block fully inactive
    kw = dict(nmf_iter=4, power_iters_cold=30, power_iters_warm=6)
    K, E, u = nmf_masked_streamed(F, mask, interpret=True,
                                  gene_active=jnp.asarray(act), **kw)
    K, E, u = np.asarray(K), np.asarray(E), np.asarray(u)
    assert np.all(K[8:] == 0) and np.all(E[8:] == 0) and np.all(u[8:] == 0)
    assert np.all(np.isfinite(K)) and np.all(np.isfinite(E))
    K_ref, _, _ = nmf_masked(F, mask, **kw)
    np.testing.assert_allclose(K[:8], np.asarray(K_ref)[:8],
                               rtol=1e-4, atol=1e-4)


def test_streamed_u0_resume_matches_xla_resume():
    """Warm-started cold rank-1 (trim-round resume) must track the XLA
    path given the same u0 and reduced cold iterations."""
    rng = np.random.default_rng(63)
    F, mask = wide_bucket(rng, 8, 4, 2 * _CHUNK_W)
    kw = dict(nmf_iter=6, power_iters_cold=60, power_iters_warm=10)
    _, _, u_prev = nmf_masked(F, mask, **kw)
    # drop a chunk of columns, as a trim round would
    mask2 = np.asarray(mask).copy()
    mask2[:, -_CHUNK_W // 2:] = False
    kw_res = dict(nmf_iter=6, power_iters_cold=16, power_iters_warm=10)
    K1, E1, _ = nmf_masked(F, jnp.asarray(mask2), u0=u_prev, **kw_res)
    K2, E2, _ = nmf_masked_streamed(F, jnp.asarray(mask2), u0=u_prev,
                                    interpret=True, **kw_res)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-4, atol=1e-4)


def test_streamed_raw_int16_bit_identical():
    """Raw int16 F + scale (the engine's device-resident form) must be
    BIT-IDENTICAL to streaming the pre-adjusted f32 form: the kernel
    applies cast / divide / mask in the XLA path's exact op order.

    Holds whenever both forms pick the same chunk width (here W=2048:
    both stream 1024-chunks).  When the int16 form's smaller DMA slots
    afford a LARGER chunk (_pick_chunk_w itemsize, e.g. p=32 W=4096), the
    Gram partial sums accumulate in a different order — plain f32
    reduction-order drift (~1e-7), far inside the bf16-Gram class."""
    rng = np.random.default_rng(65)
    F, mask = wide_bucket(rng, 10, 4, 2 * _CHUNK_W)
    F_i16 = np.asarray(F).astype(np.int16)
    scale = (0.5 + rng.random(4)).astype(np.float32)
    F_adj = (jnp.asarray(F_i16).astype(jnp.float32)
             / jnp.asarray(scale)[None, :, None])
    kw = dict(nmf_iter=6, power_iters_cold=40, power_iters_warm=8)
    K1, E1, u1 = nmf_masked_streamed(F_adj, mask, interpret=True, **kw)
    K2, E2, u2 = nmf_masked_streamed(jnp.asarray(F_i16), mask,
                                     scale=jnp.asarray(scale),
                                     interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(K1), np.asarray(K2))
    np.testing.assert_array_equal(np.asarray(E1), np.asarray(E2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_nmf_masked_raw_routing():
    """core.nmf.nmf_masked with F_raw/scale must reproduce the premasked
    f32 streamed result exactly."""
    rng = np.random.default_rng(66)
    F, mask = wide_bucket(rng, 8, 32, 2 * _CHUNK_W)
    F_i16 = np.asarray(F).astype(np.int16)
    scale = (0.5 + rng.random(32)).astype(np.float32)
    F_adj = (jnp.asarray(F_i16).astype(jnp.float32)
             / jnp.asarray(scale)[None, :, None])
    kw = dict(nmf_iter=3, power_iters_cold=16, power_iters_warm=4,
              use_pallas=True, pallas_interpret=True)
    K1, E1, _ = nmf_masked(F_adj, mask, **kw)
    K2, E2, _ = nmf_masked(F_adj, mask, F_raw=jnp.asarray(F_i16),
                           scale=jnp.asarray(scale), **kw)
    np.testing.assert_array_equal(np.asarray(K1), np.asarray(K2))
    np.testing.assert_array_equal(np.asarray(E1), np.asarray(E2))


def test_engine_raw_int16_streamed_path():
    """Whole-engine check of the raw route: int16 packing
    (integral_int16able) -> _bucket_step hands F_raw+scale down -> the
    trim loop's streamed NMF reads int16 directly. Must match the XLA
    engine within the production f32 tolerance."""
    from collections import OrderedDict
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.engine import DegNormEngine
    rng = np.random.default_rng(70)
    cov = OrderedDict(
        (f"g{i}", np.round(random_coverage(
            rng, 32, int(rng.integers(1100, 2049)), degraded=(i % 2 == 0))
        ).astype(np.float32))
        for i in range(12))
    X = np.round(np.abs(rng.standard_normal((12, 32))) * 150 + 30)
    cfg = NMFConfig(nmf_iter=4, degnorm_iter=2)
    r1 = DegNormEngine(cfg, EngineConfig(
        use_pallas=False, bucket_widths=(2048,))).run(cov, X.copy())
    eng = DegNormEngine(cfg, EngineConfig(
        use_pallas=True, pallas_interpret=True, bucket_widths=(2048,)))
    r2 = eng.run(cov, X.copy())
    assert eng._device_F[0].dtype == jnp.int16   # raw path actually taken
    np.testing.assert_allclose(r1.rho, r2.rho, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(r1.x_adj, r2.x_adj, rtol=5e-3, atol=5e-3)


def test_nmf_masked_routes_wide_blocks_to_stream(monkeypatch):
    """core.nmf.nmf_masked must route resident-gate rejects to the
    streamed kernel (not the XLA fallback) when stream=True."""
    import degnorm_tpu.ops.pallas_stream as ps
    calls = {}
    orig = ps.nmf_masked_streamed

    def spy(*a, **k):
        calls["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ps, "nmf_masked_streamed", spy)
    rng = np.random.default_rng(64)
    # p=32 x W=2048 fails the resident VMEM gate but passes the stream gate
    F, mask = wide_bucket(rng, 8, 32, 2 * _CHUNK_W)
    from degnorm_tpu.ops.pallas_nmf import pallas_supported
    assert not pallas_supported(F.shape, F.dtype)
    nmf_masked(F, mask, nmf_iter=2, use_pallas=True, pallas_interpret=True,
               power_iters_cold=8, power_iters_warm=4)
    assert calls.get("hit"), "streamed kernel was not used"
    # explicit bf16 multiplier opt-in keeps the XLA fallback
    calls.clear()
    nmf_masked(F, mask, nmf_iter=2, use_pallas=True, pallas_interpret=True,
               power_iters_cold=8, power_iters_warm=4, lam_dtype="bf16")
    assert not calls.get("hit")


def test_streamed_mxu_mode_pure_f32():
    """gram_mode="mxu" is the documented pure-f32 Gram opt-out (PARITY.md
    known deviation 5) — the streamed kernel must honor it rather than
    silently remapping to the bf16 packed panels. f32 MXU vs f32 VPU Gram
    differ only by contraction order, so the tolerance is tight."""
    rng = np.random.default_rng(63)
    F, mask = wide_bucket(rng, 8, 8, 2 * _CHUNK_W)
    kw = dict(nmf_iter=8, power_iters_cold=60, power_iters_warm=10)
    K1, E1, _ = nmf_masked(F, mask, **kw)
    K2, E2, _ = nmf_masked_streamed(F, mask, interpret=True,
                                    gram_mode="mxu", **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-4, atol=1e-4)
