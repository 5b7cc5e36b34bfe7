"""Property-based fuzz of the W-streamed NMF kernel (interpret mode).

Randomized shapes, masks (including all-masked genes), warm starts,
gene_active patterns, and raw-int16 inputs must all track the XLA
reference lowering (core/nmf.py::nmf_masked). Complements the
deterministic cases in tests/test_stream.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from degnorm_tpu.core.nmf import nmf_masked
from degnorm_tpu.ops.pallas_stream import (_CHUNK_W, nmf_masked_streamed,
                                           streamed_supported)


def random_case(rng):
    p = int(rng.choice([2, 3, 4, 8, 16]))
    W = int(rng.choice([2, 3, 4])) * _CHUNK_W
    G = int(rng.integers(3, 20))
    F = np.zeros((G, p, W), np.float32)
    mask = np.zeros((G, W), bool)
    for g in range(G):
        if rng.random() < 0.1:
            continue                      # fully masked gene
        L = int(rng.integers(2, W + 1))
        t = np.linspace(0, 1, L)
        base = np.abs(np.sin(np.pi * t) + 0.1)
        amp = 1 + 40 * rng.random((p, 1))
        F[g, :, :L] = np.round(amp * base * (1 + rng.random((p, L))))
        mask[g, :L] = True
        # random interior mask holes (downsampling / trim analogs)
        holes = rng.random(W) < rng.uniform(0, 0.5)
        mask[g] &= ~holes
    return F, mask, p, W, G


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_streamed_vs_xla(seed):
    rng = np.random.default_rng(100 + seed)
    F, mask, p, W, G = random_case(rng)
    assert streamed_supported(F.shape, F.dtype)
    kw = dict(nmf_iter=int(rng.integers(1, 8)),
              power_iters_cold=40, power_iters_warm=8)
    act = rng.random(G) < 0.8
    u0 = None
    if rng.random() < 0.5:
        u0 = jnp.asarray(
            np.abs(rng.standard_normal((G, p))).astype(np.float32))
        u0 = u0 / jnp.linalg.norm(u0, axis=1, keepdims=True)
    K1, E1, _ = nmf_masked(jnp.asarray(F), jnp.asarray(mask),
                           gene_active=jnp.asarray(act), u0=u0, **kw)
    K2, E2, _ = nmf_masked_streamed(jnp.asarray(F), jnp.asarray(mask),
                                    gene_active=jnp.asarray(act), u0=u0,
                                    interpret=True, **kw)
    # the XLA path computes inactive genes anyway; compare active ones
    K1, E1 = np.asarray(K1)[act], np.asarray(E1)[act]
    K2, E2 = np.asarray(K2)[act], np.asarray(E2)[act]
    assert np.all(np.isfinite(K2)) and np.all(np.isfinite(E2))
    np.testing.assert_allclose(K1, K2, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(E1, E2, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_streamed_raw_int16(seed):
    rng = np.random.default_rng(200 + seed)
    F, mask, p, W, G = random_case(rng)
    F_i16 = F.astype(np.int16)
    scale = (0.25 + 2 * rng.random(p)).astype(np.float32)
    F_adj = (jnp.asarray(F_i16).astype(jnp.float32)
             / jnp.asarray(scale)[None, :, None])
    kw = dict(nmf_iter=int(rng.integers(1, 6)),
              power_iters_cold=30, power_iters_warm=6)
    K1, E1, _ = nmf_masked_streamed(F_adj, jnp.asarray(mask),
                                    interpret=True, **kw)
    K2, E2, _ = nmf_masked_streamed(jnp.asarray(F_i16), jnp.asarray(mask),
                                    scale=jnp.asarray(scale),
                                    interpret=True, **kw)
    # same chunk width in interpret at these shapes -> bit-identical
    np.testing.assert_array_equal(np.asarray(K1), np.asarray(K2))
    np.testing.assert_array_equal(np.asarray(E1), np.asarray(E2))
