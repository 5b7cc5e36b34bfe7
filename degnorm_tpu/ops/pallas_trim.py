"""Fully fused Pallas TPU kernel for the baseline-selection trim loop.

The XLA trim loop (core/baseline.py) re-reads the (G, p, W) bucket from HBM
~6 times per round (column-mask rebuild, residual pass, A0 masking, the NMF
kernel's own read, clipped row sums) for up to 16 rounds.  This kernel runs
the ENTIRE loop — residual scoring, bin dropping, the full Lagrangian NMF,
DI refresh and every early-exit flag — on one VMEM-resident gene block:

    HBM traffic:   XLA  ~ 6 * rounds * G*p*W*4 bytes
                   here ~ 1 * G*p*W*4 bytes     (read Fm once per block)

Semantics are identical to the ``lax.while_loop`` in
``core/baseline.py::baseline_select_bucket`` (itself the device re-design
of reference ``degnorm/nmf.py:273-324``); the XLA path remains the source
of truth and the interpret-mode parity target.  One structural fact keeps
the interface small: the trim state's ``E`` factor is never consumed after
the loop (the post-loop refit re-derives E from K by envelope —
core/baseline.py:272-316), so the kernel emits only K, rho and the flags.

Booleans are carried as {0,1} float32 masks and counters as float32 (exact
below 2^24) — Mosaic vectorizes f32 selects on every shape involved.

Because the TPU Pallas grid executes sequentially on the core, the
block-level ``@pl.when`` skip means gene blocks whose genes have all left
the loop cost one DMA and no compute — composing with the engine's
cross-iteration reordering of genes by exit round (engine.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from degnorm_tpu.ops.pallas_nmf import (_VMEM_BUDGET, _finish_KE, _nmf_loop,
                                        _rank1_uv, _resolve_lam_dtype,
                                        _trim_blocks)

_NEG = -1e30


def _trim_kernel(fm_ref, binid_ref, bincnt_ref, k0_ref, e0_ref, rho0_ref,
                 u0_ref, nhi_ref, nbins_ref, act0_ref,
                 k_ref, rho_ref, ranbs_ref, rounds_ref,
                 lam_ref, *,
                 nmf_iter, power_cold, power_warm, power_resume, gram_mode,
                 warm_plain, max_rounds, min_bins, min_gene_len,
                 n_bins_total, fast, nmf_tol=0.0):
    B = n_bins_total
    # Defaults = loop-never-ran state (also the all-inactive-block result).
    k_ref[:] = k0_ref[:]
    rho_ref[:] = rho0_ref[:]
    ranbs_ref[:] = jnp.zeros(ranbs_ref.shape, ranbs_ref.dtype)
    rounds_ref[:] = jnp.zeros(rounds_ref.shape, rounds_ref.dtype)

    @pl.when(jnp.max(act0_ref[:]) > 0)
    def _():
        Fm = fm_ref[:]                                  # (bg, p, W)
        bin_id = binid_ref[:]                           # (bg, W) int32
        bin_count = bincnt_ref[:]                       # (bg, B)
        bg, p, W = Fm.shape
        dtype = Fm.dtype

        def col_active_from(bin_active):
            # B unrolled compare-and-accumulate passes (no gathers);
            # padding columns carry the B sentinel and stay inactive.
            act = jnp.zeros((bg, W), dtype)
            for b in range(B):
                act = act + ((bin_id == b).astype(dtype)
                             * bin_active[:, b:b + 1])
            return act

        def per_bin_sums(res):
            return jnp.concatenate(
                [jnp.sum(res * (bin_id == b).astype(dtype), axis=1,
                         keepdims=True) for b in range(B)], axis=1)

        bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        bin_active0 = (bin_ids.astype(dtype) < nbins_ref[:]).astype(dtype)

        lam_form = lam_ref.dtype != dtype       # bf16 opt-in storage
        if fast:
            # warm-start mode: multipliers persist across rounds in the
            # scratch (masked to surviving columns each round).  f32
            # storage holds X = A0 + lambda (X-form, see _nmf_loop):
            # initializing to Fm encodes lambda = 0 on every column, and
            # the cross-round mask X <- X*can equals A0_new + lambda*can
            # exactly (surviving columns keep Fm, dropped ones zero).
            lam_ref[:] = (jnp.zeros(lam_ref.shape, lam_ref.dtype)
                          if lam_form else Fm)

        def cond(st):
            return (jnp.max(st[7]) > 0) & (st[10] < max_rounds)

        def body(st):
            (K, E, rho, u, bin_active, n_hi, n_bins, active, ran_bs,
             clipped, rounds, rounds_active) = st

            ran_bs = jnp.maximum(ran_bs, active)        # nmf.py:276
            ca = col_active_from(bin_active)

            # worst squared relative residual per column (nmf.py:280-283);
            # round-1 uses the unclipped initial estimate, later rounds
            # the clipped one (core/baseline.py clip subtlety).
            KE = K[:, :, None] * E[:, None, :]
            KE = jnp.where(clipped[:, :, None] > 0, jnp.maximum(KE, Fm), KE)
            z = (KE - Fm) / (Fm + 1.0)
            res = jnp.max(z * z, axis=1) * ca
            ss_sum = per_bin_sums(res)
            ss_r = ss_sum / jnp.maximum(bin_count, 1.0)
            ss_masked = jnp.where(bin_active > 0, ss_r, _NEG)

            perfect = (jnp.max(ss_masked, axis=1, keepdims=True)
                       == 0.0).astype(dtype)            # nmf.py:286-287
            proceed = active * (1.0 - perfect)

            drop = jnp.argmax(ss_masked, axis=1)[:, None]   # (bg, 1) i32
            drop_onehot = (bin_ids == drop).astype(dtype)
            bin_active = jnp.where(proceed > 0,
                                   bin_active * (1.0 - drop_onehot),
                                   bin_active)
            dropped = jnp.sum(drop_onehot * bin_count, axis=1, keepdims=True)
            n_hi = jnp.where(proceed > 0, n_hi - dropped, n_hi)
            n_bins = jnp.where(proceed > 0, n_bins - 1.0, n_bins)

            # svds ValueError below 2 columns (nmf.py:306-310): stop
            # WITHOUT refreshing factors or rho.
            run_nmf = proceed * (n_hi >= 2.0).astype(dtype)
            can = col_active_from(bin_active)

            A0 = Fm * can[:, None, :]
            if fast:
                # Warm restart: previous multipliers (zeroed on dropped
                # columns) + previous left vector; nmf_iter/4 inner steps.
                # EngineConfig.trim_fast — an opt-in numeric deviation.
                n_it = max(nmf_iter // 4, 8)
                step = 1.0 / (n_it ** 0.5)
                if lam_form:
                    lam_masked = lam_ref[:].astype(dtype) * can[:, None, :]
                    lam_ref[:] = lam_masked.astype(lam_ref.dtype)
                    X0 = A0 + lam_masked
                else:
                    X0 = lam_ref[:] * can[:, None, :]   # = A0 + lam*can
                    lam_ref[:] = X0
                # Scale-free (u, v = Xᵀu) carry — est = K·E == u ⊗ v, so
                # _rank1's per-iteration Rayleigh/sqrt/divide tail is dead
                # (see ops/pallas_nmf.py::_rank1_uv); K, E materialize
                # once per round via _finish_KE.
                uc, vc = _rank1_uv(X0, u, power_warm, gram_mode)

                def fbody(_, carry):
                    uc, vc = carry
                    est = uc[:, :, None] * vc[:, None, :]
                    if lam_form:
                        lam = jnp.maximum(
                            lam_ref[:].astype(dtype) - step * (est - A0),
                            0.0)
                        lam_ref[:] = lam.astype(lam_ref.dtype)
                        X = A0 + lam
                    else:
                        X = jnp.maximum(lam_ref[:] - step * (est - A0), A0)
                        lam_ref[:] = X
                    return _rank1_uv(X, uc, power_warm, gram_mode,
                                     warm_plain=warm_plain)

                un, vn = jax.lax.fori_loop(0, n_it, fbody, (uc, vc))
                X_fin = (A0 + lam_ref[:].astype(dtype) if lam_form
                         else lam_ref[:])
                # recompute_v in the bf16 lam mode: vn came from the last
                # UNROUNDED X while X_fin is rebuilt from the rounded
                # stored multipliers (see _finish_KE's docstring)
                Kn, En = _finish_KE(X_fin, un, vn, gram_mode,
                                    recompute_v=lam_form)
            else:
                # cold rank-1 warm-started from the previous round's left
                # vector at the reduced resume iteration count (the Perron
                # target is unchanged — EngineConfig.power_iters_resume)
                Kn, En, un = _nmf_loop(A0, lam_ref, nmf_iter=nmf_iter,
                                       power_cold=power_resume,
                                       power_warm=power_warm,
                                       gram_mode=gram_mode,
                                       warm_plain=warm_plain, u0=u,
                                       nmf_tol=nmf_tol)
            est_rs = Kn * jnp.sum(En, axis=1, keepdims=True)
            zero_row = (jnp.min(est_rs, axis=1, keepdims=True)
                        == 0.0).astype(dtype)           # nmf.py:315-316
            update_rho = run_nmf * (1.0 - zero_row)

            # clip up to F, recompute DI (nmf.py:318-321)
            KE_clip = jnp.maximum(Kn[:, :, None] * En[:, None, :], Fm)
            rs_F = jnp.sum(Fm * can[:, None, :], axis=2)
            rs_KE = jnp.sum(KE_clip * can[:, None, :], axis=2)
            rho_new = 1.0 - rs_F / (rs_KE + 1.0)

            K = jnp.where(run_nmf > 0, Kn, K)
            E = jnp.where(run_nmf > 0, En, E)
            u = jnp.where(run_nmf > 0, un, u)
            rho = jnp.where(update_rho > 0, rho_new, rho)
            clipped = jnp.maximum(clipped, update_rho)

            floor_hit = jnp.maximum(
                (n_bins <= min_bins).astype(dtype),
                (n_hi < min_gene_len).astype(dtype))    # nmf.py:323-324
            active_new = (update_rho * (1.0 - floor_hit)
                          * (jnp.max(rho_new, axis=1, keepdims=True)
                             > 0.1).astype(dtype))      # nmf.py:273
            return (K, E, rho, u, bin_active, n_hi, n_bins, active_new,
                    ran_bs, clipped, rounds + 1, rounds_active + active)

        st0 = (k0_ref[:], e0_ref[:], rho0_ref[:], u0_ref[:], bin_active0,
               nhi_ref[:], nbins_ref[:], act0_ref[:],
               jnp.zeros(act0_ref.shape, dtype),
               jnp.zeros(act0_ref.shape, dtype),
               jnp.zeros((), jnp.int32),
               jnp.zeros(act0_ref.shape, dtype))
        st = jax.lax.while_loop(cond, body, st0)

        k_ref[:] = st[0]
        rho_ref[:] = st[2]
        ranbs_ref[:] = st[8]
        rounds_ref[:] = st[11]


def pick_block_genes_trim(G: int, p: int, W: int, dtype_bytes: int = 4,
                          lam_bf16: bool = False,
                          vmem_frac: float = 1.0) -> int:
    """Largest gene-block whose trim working set (~_trim_blocks(p) live
    buffers: double-buffered Fm, lam scratch, A0/KE/clip transients) fits
    the VMEM budget; multiple of 8 (sublane tiling).  ``lam_bf16`` halves
    the lambda scratch's share.  ``vmem_frac`` scales the budget (engine
    soft retry, EngineConfig.vmem_frac)."""
    per_gene = int(_trim_blocks(p) * p * W * dtype_bytes)
    if lam_bf16:
        per_gene -= p * W * dtype_bytes // 2
    bg = (int(_VMEM_BUDGET * vmem_frac) // per_gene) // 8 * 8
    # compile-complexity cap — see pick_block_genes in pallas_nmf.py
    # (narrow-bucket blocks of 200+ genes crash/stall the compile service)
    bg = min(bg, 64)
    return int(max(8, min(bg, ((G + 7) // 8) * 8)))


def trim_loop_pallas(
    Fm: jnp.ndarray,
    bin_id: jnp.ndarray,
    bin_count: jnp.ndarray,
    K0: jnp.ndarray,
    E0: jnp.ndarray,
    rho0: jnp.ndarray,
    u0: jnp.ndarray,
    n_hi: jnp.ndarray,
    n_bins: jnp.ndarray,
    active0: jnp.ndarray,
    *,
    nmf_iter: int,
    power_iters_cold: int,
    power_iters_warm: int,
    gram_mode: str,
    power_warm_plain: int = 0,
    power_iters_resume: int = 0,
    lam_dtype: str = "auto",
    max_rounds: int,
    min_bins: int,
    min_gene_len: int,
    fast: bool = False,
    interpret: bool = False,
    vmem_frac: float = 1.0,
    nmf_tol: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the whole trim loop for a padded bucket on VMEM-resident blocks.

    Args mirror the state of ``core/baseline.py``'s ``lax.while_loop``:
      Fm: (G, p, W) length-masked scale-adjusted coverage.
      bin_id: (G, W) int32 trim-bin id per column (B = padding sentinel).
      bin_count: (G, B) float column count per bin.
      K0/E0/rho0: initial NMF factors and DI scores.
      n_hi/n_bins: (G,) int/float surviving column / bin counts.
      active0: (G,) bool — genes entering the loop.

    Returns (K, rho, ran_bs, rounds_active) — E is post-loop-dead (see
    module docstring).
    """
    G, p, W = Fm.shape
    B = bin_count.shape[1]
    dtype = Fm.dtype
    if gram_mode == "auto":
        gram_mode = "vpu" if interpret else "packed_slice"

    lam_jdtype = _resolve_lam_dtype(lam_dtype, p, interpret)
    bg = pick_block_genes_trim(G, p, W,
                               lam_bf16=lam_jdtype == jnp.bfloat16,
                               vmem_frac=vmem_frac)
    G_pad = ((G + bg - 1) // bg) * bg
    pad = G_pad - G

    def pad0(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    Fm_p = pad0(Fm)
    bin_id_p = jnp.pad(bin_id, ((0, pad), (0, 0)),
                       constant_values=B)          # sentinel: never active
    bincnt_p = pad0(bin_count.astype(dtype))
    K0_p, E0_p, rho0_p = pad0(K0), pad0(E0), pad0(rho0)
    u0_p = pad0(u0)
    nhi_p = pad0(n_hi.astype(dtype)[:, None])
    nbins_p = pad0(n_bins.astype(dtype)[:, None])
    act_p = pad0(active0.astype(dtype)[:, None])

    kernel = functools.partial(
        _trim_kernel, nmf_iter=nmf_iter, power_cold=power_iters_cold,
        power_warm=power_iters_warm,
        power_resume=power_iters_resume or power_iters_cold,
        gram_mode=gram_mode, warm_plain=power_warm_plain,
        max_rounds=max_rounds, min_bins=float(min_bins),
        min_gene_len=float(min_gene_len), n_bins_total=B, fast=fast,
        nmf_tol=float(nmf_tol))

    def row_spec(n):
        return pl.BlockSpec((bg, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    K, rho, ran_bs, rounds = pl.pallas_call(
        kernel,
        grid=(G_pad // bg,),
        in_specs=[
            pl.BlockSpec((bg, p, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec(W), row_spec(B), row_spec(p), row_spec(W), row_spec(p),
            row_spec(p), row_spec(1), row_spec(1), row_spec(1),
        ],
        out_specs=(row_spec(p), row_spec(p), row_spec(1), row_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((G_pad, p), dtype),
            jax.ShapeDtypeStruct((G_pad, p), dtype),
            jax.ShapeDtypeStruct((G_pad, 1), dtype),
            jax.ShapeDtypeStruct((G_pad, 1), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bg, p, W), lam_jdtype)],
        interpret=interpret,
    )(Fm_p, bin_id_p, bincnt_p, K0_p, E0_p, rho0_p, u0_p,
      nhi_p, nbins_p, act_p)

    return (K[:G], rho[:G], ran_bs[:G, 0] > 0,
            rounds[:G, 0].astype(jnp.int32))


def fused_trim_supported(F_shape, dtype) -> bool:
    G, p, W = F_shape
    return (jnp.dtype(dtype) == jnp.float32
            and W % 128 == 0
            and 8 * _trim_blocks(p) * p * W * 4 <= _VMEM_BUDGET)
