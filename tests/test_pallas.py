"""Fused Pallas NMF kernel parity (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from degnorm_tpu.config import EngineConfig, NMFConfig
from degnorm_tpu.core.baseline import baseline_select_bucket
from degnorm_tpu.core.nmf import nmf_masked
from degnorm_tpu.ops.pallas_nmf import nmf_masked_pallas, pick_block_genes
from tests.conftest import random_coverage
from tests.test_core_parity import make_bucket


def test_block_sizing_sublane_aligned():
    for G, p, W in ((192, 8, 4096), (1000, 4, 512), (3, 2, 256)):
        bg = pick_block_genes(G, p, W)
        assert bg % 8 == 0 and bg >= 8


def test_block_model_matches_hardware_probe():
    """Pin the empirical VMEM block model to its hardware-validated values
    (see the hazard ledger at ops/pallas_nmf.py::_VMEM_BUDGET: compile-
    cache masking, standalone-vs-in-context under-accounting, grid-size-
    dependent live sets).  These sizes ran every round-1 workload; trim
    bg=56 @ p=8 W=1024 failed IN CONTEXT at G=24576 (16.45M/16.00M), so
    bg=48 with ~1.9M slack is the ceiling.  Change deliberately and
    re-probe with tools/r2_block_probe2.py at BOTH small and large G."""
    from degnorm_tpu.ops.pallas_trim import (fused_trim_supported,
                                             pick_block_genes_trim)
    assert pick_block_genes_trim(24576, 8, 1024) == 48  # 56 rejected 16.45M
    assert pick_block_genes_trim(512, 8, 4096) == 8
    assert pick_block_genes_trim(1024, 16, 1024) == 24
    assert pick_block_genes_trim(512, 32, 512) == 24    # 32 rejected 16.25M
    # W=8192 p=8: the minimal 8-gene trim block does not pass the gate
    # (2 MiB-block configs sit at the in-context failure boundary)
    assert not fused_trim_supported((64, 8, 8192), jnp.float32)
    assert pick_block_genes(24576, 8, 1024) == 56
    assert pick_block_genes(512, 32, 512) == 24
    # the engine's soft-retry knob shrinks blocks without code changes
    assert pick_block_genes_trim(24576, 8, 1024, vmem_frac=0.5) == 24
    assert pick_block_genes(24576, 8, 1024, vmem_frac=0.5) == 24


def test_pallas_nmf_matches_xla():
    rng = np.random.default_rng(44)
    mats = [random_coverage(rng, 4, L).astype(np.float32)
            for L in (150, 256, 90)]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    kw = dict(nmf_iter=10, power_iters_cold=60, power_iters_warm=10)
    K1, E1, _ = nmf_masked(F, mask, **kw)
    K2, E2, _ = nmf_masked_pallas(F, mask, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-4, atol=1e-4)


def test_ratio_rowsums_pallas_matches_xla():
    from degnorm_tpu.core.nmf import ratio_svd_rowsums
    from degnorm_tpu.ops.pallas_nmf import ratio_rowsums_pallas
    rng = np.random.default_rng(47)
    mats = [random_coverage(rng, 4, L).astype(np.float32)
            for L in (200, 256, 120)]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    cs1, es1 = ratio_svd_rowsums(F, mask, power_iters=60)
    cs2, es2 = ratio_rowsums_pallas(F, mask, power_iters=60,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(cs1), np.asarray(cs2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(es1), np.asarray(es2),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("gram_mode,wp", [("packed_slice", 0), ("vpu", 4)])
def test_packed_and_plain_warm_modes(gram_mode, wp):
    """The packed MXU v-contraction mode and plain warm-restart power steps
    must stay within the bf16-product / warm-convergence tolerance classes
    of the baseline kernel (PARITY.md known deviation 5)."""
    rng = np.random.default_rng(48)
    mats = [random_coverage(rng, 8, L).astype(np.float32)
            for L in (150, 256, 90, 200)]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    kw = dict(nmf_iter=10, power_iters_cold=60, power_iters_warm=12)
    K1, E1, _ = nmf_masked_pallas(F, mask, interpret=True, **kw)
    K2, E2, _ = nmf_masked_pallas(F, mask, interpret=True,
                                  gram_mode=gram_mode,
                                  power_warm_plain=wp, **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=5e-3, atol=5e-3)


def test_bf16_lambda_storage_drift():
    """bf16-stored Lagrange multipliers (EngineConfig.lam_dtype) round the
    multipliers once per inner iteration; against f32 storage the factors
    must stay within the bf16-product tolerance class (PARITY.md
    deviation 5)."""
    rng = np.random.default_rng(50)
    mats = [random_coverage(rng, 16, L).astype(np.float32)
            for L in (150, 256, 90, 200)]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    kw = dict(nmf_iter=10, power_iters_cold=60, power_iters_warm=12)
    K1, E1, _ = nmf_masked_pallas(F, mask, interpret=True, **kw)
    K2, E2, _ = nmf_masked_pallas(F, mask, interpret=True,
                                  lam_dtype="bf16", **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=5e-3, atol=5e-3)


def test_bf16_lambda_trim_fast_drift():
    """trim_fast + lam_dtype="bf16" (both opt-in): the warm-restarted trim
    rounds with bf16-stored multipliers must stay within the bf16-product
    tolerance class of the f32-stored trim_fast path, with identical
    baseline-selection decisions.  Also pins the ADVICE-round fix that
    _finish_KE recomputes v from the ROUNDED X_fin in the lam_form paths
    (K and E now factor one consistent X state)."""
    rng = np.random.default_rng(54)
    mats = [random_coverage(rng, 8, L, degraded=(i % 2 == 0)
                            ).astype(np.float32)
            for i, L in enumerate((200, 256, 180, 230, 140, 250, 210, 160))]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    cfg = NMFConfig(nmf_iter=12)
    base = dict(use_pallas=True, pallas_interpret=True, fuse_trim=True,
                trim_fast=True)
    r_f32 = baseline_select_bucket(F, mask, cfg, EngineConfig(**base))
    r_bf16 = baseline_select_bucket(
        F, mask, cfg, EngineConfig(lam_dtype="bf16", **base))
    assert int(np.asarray(r_f32.ran_bs).sum()) > 0, "trim loop never ran"
    np.testing.assert_array_equal(np.asarray(r_f32.ran_bs),
                                  np.asarray(r_bf16.ran_bs))
    np.testing.assert_allclose(np.asarray(r_bf16.rho),
                               np.asarray(r_f32.rho), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(r_bf16.est_K),
                               np.asarray(r_f32.est_K),
                               rtol=5e-3, atol=5e-3)


def test_nmf_tol_xla_adaptive_matches_full_loop():
    """EngineConfig.nmf_tol (opt-in adaptive convergence) on the XLA path:
    at a tight tolerance the frozen-gene loop must stay within the
    power-iteration convergence class of the full fixed-count loop, and
    per-gene freezing must make results invariant to batching (PARITY.md
    known deviation: nmf_tol)."""
    rng = np.random.default_rng(51)
    mats = [random_coverage(rng, 4, L, degraded=(i % 2 == 0)
                            ).astype(np.float32)
            for i, L in enumerate((150, 256, 90, 200))]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    kw = dict(nmf_iter=50, power_iters_cold=60, power_iters_warm=10)
    K_full, E_full, _ = nmf_masked(F, mask, **kw)
    K_tol, E_tol, _ = nmf_masked(F, mask, nmf_tol=1e-5, **kw)
    np.testing.assert_allclose(np.asarray(K_tol), np.asarray(K_full),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(E_tol), np.asarray(E_full),
                               rtol=1e-3, atol=1e-3)
    # batching invariance: each gene freezes on its own history only
    Ka, Ea, _ = nmf_masked(F[:2], mask[:2], nmf_tol=1e-4, **kw)
    Kb, Eb, _ = nmf_masked(F[2:], mask[2:], nmf_tol=1e-4, **kw)
    K_all, E_all, _ = nmf_masked(F, mask, nmf_tol=1e-4, **kw)
    np.testing.assert_allclose(np.concatenate([Ka, Kb]), np.asarray(K_all),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.concatenate([Ea, Eb]), np.asarray(E_all),
                               rtol=1e-6, atol=1e-7)


def test_nmf_tol_pallas_matches_xla():
    """The fused kernel's per-gene freeze + early exit must track the XLA
    adaptive loop at the usual kernel tolerance (nmf_tol > 0 on BOTH)."""
    rng = np.random.default_rng(52)
    mats = [random_coverage(rng, 4, L, degraded=(i % 2 == 0)
                            ).astype(np.float32)
            for i, L in enumerate((150, 256, 90, 200))]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    kw = dict(nmf_iter=30, power_iters_cold=60, power_iters_warm=10,
              nmf_tol=1e-4)
    K1, E1, _ = nmf_masked(F, mask, **kw)
    K2, E2, _ = nmf_masked_pallas(F, mask, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-4, atol=1e-4)


def test_nmf_tol_trim_path_parity():
    """Full baseline selection at nmf_tol > 0: fused trim kernel vs XLA
    while_loop — identical decisions, f32-class DI drift."""
    rng = np.random.default_rng(53)
    mats = [random_coverage(rng, 4, L, degraded=(i % 2 == 0)
                            ).astype(np.float32)
            for i, L in enumerate((200, 256, 180, 230, 140, 250, 210, 160))]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    cfg = NMFConfig(nmf_iter=12)
    r_xla = baseline_select_bucket(
        F, mask, cfg, EngineConfig(use_pallas=False, nmf_tol=1e-4))
    r_fused = baseline_select_bucket(
        F, mask, cfg, EngineConfig(use_pallas=True, pallas_interpret=True,
                                   fuse_trim=True, nmf_tol=1e-4))
    assert int(np.asarray(r_xla.ran_bs).sum()) > 0, "trim loop never ran"
    np.testing.assert_array_equal(np.asarray(r_xla.ran_bs),
                                  np.asarray(r_fused.ran_bs))
    np.testing.assert_array_equal(np.asarray(r_xla.rounds_active),
                                  np.asarray(r_fused.rounds_active))
    np.testing.assert_allclose(np.asarray(r_fused.rho),
                               np.asarray(r_xla.rho), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("gram_mode", ["vpu", "mxu"])
def test_fused_trim_matches_xla(gram_mode):
    """The fully fused trim-loop kernel (ops/pallas_trim.py, interpret
    mode) must reproduce the XLA while_loop's decisions bit-for-bit and
    its numerics at float32 tolerance, for both Gram implementations."""
    rng = np.random.default_rng(46)
    mats = []
    for i, L in enumerate((200, 256, 180, 230, 140, 250, 210, 160)):
        mats.append(random_coverage(rng, 4, L, degraded=(i % 2 == 0)
                                    ).astype(np.float32))
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    cfg = NMFConfig(nmf_iter=12)
    r_xla = baseline_select_bucket(
        F, mask, cfg, EngineConfig(use_pallas=False))
    r_fused = baseline_select_bucket(
        F, mask, cfg, EngineConfig(use_pallas=True, pallas_interpret=True,
                                   fuse_trim=True, gram_mode=gram_mode))
    assert int(np.asarray(r_xla.ran_bs).sum()) > 0, "trim loop never ran"
    np.testing.assert_array_equal(np.asarray(r_xla.ran_bs),
                                  np.asarray(r_fused.ran_bs))
    np.testing.assert_array_equal(np.asarray(r_xla.rounds_active),
                                  np.asarray(r_fused.rounds_active))
    np.testing.assert_array_equal(np.asarray(r_xla.est_kind),
                                  np.asarray(r_fused.est_kind))
    # numeric gates at the wp1-default convergence class: with a single
    # plain warm matvec (power_warm_plain=1, round 4) the twins' Gram
    # op-order differences get less contraction per iteration, so rho
    # parity sits at ~2e-4 instead of wp2's ~1e-4 (decisions above remain
    # bitwise-equal — the gate that matters)
    np.testing.assert_allclose(np.asarray(r_fused.rho),
                               np.asarray(r_xla.rho), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(r_fused.est_K),
                               np.asarray(r_xla.est_K),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(r_fused.est_E),
                               np.asarray(r_xla.est_E),
                               rtol=5e-4, atol=5e-4)


def test_resume_power_iters_drift():
    """Trim rounds >= 1 resume the cold rank-1 from the previous round's
    left Perron vector at EngineConfig.power_iters_resume iterations
    (PARITY.md known deviation 5). Against the full-iteration warm start
    (resume=power_iters_cold, the superset of the old fresh start) the
    trim decisions must be identical and DI drift tiny."""
    rng = np.random.default_rng(46)
    mats = [random_coverage(rng, 4, L, degraded=(i % 2 == 0)
                            ).astype(np.float32)
            for i, L in enumerate((200, 256, 180, 230, 140, 250, 210, 160))]
    F, mask = make_bucket(mats, 256, dtype=np.float32)
    cfg = NMFConfig(nmf_iter=12)
    r_full = baseline_select_bucket(
        F, mask, cfg, EngineConfig(use_pallas=False, power_iters_resume=128))
    r_resume = baseline_select_bucket(
        F, mask, cfg, EngineConfig(use_pallas=False, power_iters_resume=32))
    assert int(np.asarray(r_full.ran_bs).sum()) > 0, "trim loop never ran"
    np.testing.assert_array_equal(np.asarray(r_full.ran_bs),
                                  np.asarray(r_resume.ran_bs))
    np.testing.assert_array_equal(np.asarray(r_full.rounds_active),
                                  np.asarray(r_resume.rounds_active))
    np.testing.assert_allclose(np.asarray(r_resume.rho),
                               np.asarray(r_full.rho),
                               rtol=1e-3, atol=1e-4)


def test_baseline_bucket_with_pallas_path():
    """The whole trim kernel with the fused NMF inside (interpret mode)
    must match the plain XLA path at float32 tolerance."""
    rng = np.random.default_rng(45)
    mats = [random_coverage(rng, 3, L, degraded=(i % 2 == 0)
                            ).astype(np.float32)
            for i, L in enumerate((210, 300, 450, 128))]
    F, mask = make_bucket(mats, 512, dtype=np.float32)
    cfg = NMFConfig(nmf_iter=6)
    eng_plain = EngineConfig(rank1_method="power", dtype="float32",
                             use_pallas=False)
    eng_pl = EngineConfig(rank1_method="power", dtype="float32",
                          use_pallas=True, pallas_interpret=True)
    r1 = baseline_select_bucket(F, mask, cfg, eng_plain)
    r2 = baseline_select_bucket(F, mask, cfg, eng_pl)
    np.testing.assert_array_equal(np.asarray(r1.ran_bs),
                                  np.asarray(r2.ran_bs))
    np.testing.assert_allclose(np.asarray(r1.rho), np.asarray(r2.rho),
                               rtol=5e-3, atol=5e-4)
