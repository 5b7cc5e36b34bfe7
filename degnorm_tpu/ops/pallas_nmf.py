"""Fused Pallas TPU kernel for the NMF-OA Lagrangian loop.

The XLA path (core/nmf.py) materializes ``est``, ``lambda`` and ``X = A0 +
lambda`` in HBM on every one of the ``nmf_iter`` iterations — ~5 HBM passes
over the (G, p, W) bucket per iteration, making the loop HBM-bandwidth
bound.  This kernel keeps one gene-block's coverage AND its Lagrange
multipliers resident in VMEM for the entire loop:

    HBM traffic:   XLA  ~ 5 * nmf_iter * G*p*W*4 bytes
                   here ~ 2 * G*p*W*4 bytes   (read A0, write E)

so the loop becomes VPU compute-bound (the Gram contraction is p passes
over the block, p <= 32).  The gene-block size is chosen so that
(A0, lambda + transients) fit the VMEM budget below.

Numerics are identical to core/nmf.py: cold-start power iteration on the
p x p Gram matrix, warm-started u across Lagrangian steps, Perron sign
convention.  Masked columns are pre-zeroed in A0, which is exact for the
rank-1 factors (core/linalg.py docstring).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-30
# VMEM sizing model: the compiler must fit the double-buffered input
# block, the lambda scratch, and the elementwise/Gram transients in the
# 16 MB scoped VMEM. We budget 13 MB (Mosaic needs slack) against an
# empirical live-buffer multiplier per kernel — measured 17.7 MB actual
# at a naive 4-block model with p=32, hence the conservative factors.
# A round-2 attempt to shrink these factors (X-form freed one live block)
# was probed three ways and REVERTED — the scoped-VMEM accounting turned
# out to be unstable in ways a static model must keep slack for:
#   * the persistent compile cache masks drift (a size "validated" one
#     session failed fresh compiles the next, same code);
#   * standalone-kernel probes under-account the surrounding program
#     (trim bg=64 @ p=8 W=1024 compiled standalone, failed inside the
#     real _bucket_step at 16.44M/16.00M);
#   * the in-context live set GROWS with grid size (trim bg=56 compiled
#     at G=2048 but failed at G=24576 at 16.45M — ~9.0 live blocks/gene
#     vs ~7.8 at the small grid).
# The factors below ran every round-1 workload (20k x 8 bench, 50k x 32
# stretch) across many program shapes: trim 8.0 -> bg=48 = ~14.1M at the
# worst observed accounting, ~1.9M slack.  p=32 W=512 bg=32 was rejected
# at 16.25M, so p>16 also keeps its factor.  If the environment drifts
# again, the engine soft-retries the fit with vmem_frac=0.5 (half-size
# blocks) before falling back to XLA (tools/r2_block_probe2.py).
_VMEM_BUDGET = 13 * 1024 * 1024


def _nmf_blocks(p: int) -> float:
    del p
    return 7.0


def _trim_blocks(p: int) -> float:
    del p
    return 8.0


def _gram(X):
    """(BG, p, W) -> (BG, p, p) via p vectorized row reductions (the
    batched dot_general form does not lower through Mosaic for tiny p)."""
    p = X.shape[1]
    rows = [jnp.sum(X * X[:, i:i + 1, :], axis=2) for i in range(p)]
    return jnp.stack(rows, axis=1)          # B[g, i, q]


def _gram_mxu(X, cast=None):
    """Gene-packed MXU Gram: (BG, p, W) -> (BG, p, p).

    The Gram contraction carries ~all the FLOPs of each rank-1 fit but p is
    far below the 128x128 systolic array, so per-gene matmuls would waste
    the MXU (p/128)^2-fold.  Instead the (BG, p, W) block is viewed as a
    (BG*p, W) row-panel and floor(128/p) genes are packed per 128-row MXU
    tile: one (rows, W) x (rows, W)^T matmul yields all pairwise row
    products of the group and the per-gene p x p Grams are its diagonal
    blocks.  FLOP waste is 128/p-fold, but the MXU's advantage over the VPU
    row-reduction form is far larger (measured ~10x end-to-end on the Gram
    at p=8, W=1024).

    ``cast=jnp.bfloat16`` additionally halves the MXU passes; the Gram is a
    positive-weighted sum of squares (no cancellation), so bf16 products
    with f32 accumulation perturb it by ~2^-9 relative — within the power
    iteration's own convergence tolerance (EngineConfig.gram_mode).
    """
    bg, p, W = X.shape
    M = X.reshape(bg * p, W)
    if cast is not None:
        M = M.astype(cast)
    gpg = max(1, 128 // p)                  # genes per 128-row MXU tile
    blocks = []
    for g0 in range(0, bg, gpg):
        rows = min(gpg, bg - g0) * p
        Mg = M[g0 * p:g0 * p + rows, :]
        BB = jax.lax.dot_general(
            Mg, Mg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for k in range(rows // p):
            blocks.append(
                jax.lax.slice(BB, (k * p, k * p), ((k + 1) * p, (k + 1) * p)))
    return jnp.stack(blocks, axis=0).astype(X.dtype)


def _gram_dispatch(X, gram_mode):
    if gram_mode == "mxu":
        return _gram_mxu(X)
    if gram_mode == "mxu_bf16":
        return _gram_mxu(X, cast=jnp.bfloat16)
    return _gram(X)


def _pack_panel(X):
    """The (bg*p, W) bf16 row panel of a (bg, p, W) block — the ONLY
    materialization of X in the packed rank-1 paths; the Gram and the v
    contraction both read it, so the f32 X never hits VMEM as a separate
    buffer."""
    bg, p, W = X.shape
    return X.reshape(bg * p, W).astype(jnp.bfloat16)


def _slice_groups(M, p):
    """Slice a bf16 row panel into <=128-row MXU groups:
    [(g0, ng, Mg)] with Mg = rows [g0*p, (g0+ng)*p)."""
    rows, W = M.shape
    bg = rows // p
    gpg = max(1, 128 // p)
    groups = []
    for g0 in range(0, bg, gpg):
        ng = min(gpg, bg - g0)
        groups.append((g0, ng,
                       jax.lax.slice(M, (g0 * p, 0), ((g0 + ng) * p, W))))
    return groups


def _pack_groups(X):
    """bf16 row-panel groups of a (bg, p, W) block (see _pack_panel)."""
    return _slice_groups(_pack_panel(X), X.shape[1])


_PACKED_MODES = ("packed_slice", "packed_bigv")


def _gram_from_groups(groups, p):
    """Per-gene p x p Grams from packed panels: one (rows, W) x (rows, W)^T
    MXU matmul per group; the per-gene Grams are the (128/p-waste) diagonal
    blocks of the result, extracted by static slices.  (A strided
    mask-and-lane-reduce extraction was tried and is NOT lowerable: Mosaic
    rejects the (rows, rows) -> (rows, ng, p) shape cast.)"""
    Bs = []
    for g0, ng, Mg in groups:
        BB = jax.lax.dot_general(
            Mg, Mg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for k in range(ng):
            Bs.append(jax.lax.slice(
                BB, (k * p, k * p), ((k + 1) * p, (k + 1) * p)))
    return jnp.stack(Bs, axis=0)


def _v_from_groups(groups, u, p, W):
    """v = X^T u per gene on the MXU, reusing the bf16 panels: with Ug the
    (ng, rows) block-diagonal embedding of the group's u rows,
    Ug @ Mg yields every gene's v as its own output row — no f32 pass over
    X (the VPU form read the whole (bg, p, W) block again per iteration)."""
    Vs = []
    for g0, ng, Mg in groups:
        rows = ng * p
        ug = jax.lax.slice(u, (g0, 0), (g0 + ng, p))         # (ng, p)
        u_rep = jnp.tile(ug, (1, ng))                        # (ng, rows)
        rid = jax.lax.broadcasted_iota(jnp.int32, (ng, rows), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (ng, rows), 1) // p
        Ug = jnp.where(rid == cid, u_rep, 0.0).astype(jnp.bfloat16)
        Vs.append(jax.lax.dot_general(
            Ug, Mg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(Vs, axis=0)                       # (bg, W)


def _v_from_panel(M, u, p):
    """v = X^T u for the WHOLE gene block in ONE matmul: U is the
    (bg, bg*p) block-diagonal embedding of every gene's u row and
    U @ M gives each gene's v as its own output row.

    vs the per-group form (_v_from_groups, 128/p genes per matmul): one
    MXU issue instead of ceil(bg*p/128), one iota/where mask build
    instead of one per group, and no concatenate — on the serial-issue-
    bound chain every removed op counts — while the MXU row padding
    WASTE falls too (bg -> 128 rows once vs ng=128/p -> 128 per group).
    The contraction length grows to bg*p, but the extra terms are the
    zeros of the block-diagonal mask (f32 accumulation, bf16 products —
    the usual packed tolerance class; accumulation-order drift only)."""
    bg = u.shape[0]
    rows = bg * p                                            # == M rows
    u_rep = jnp.tile(u, (1, bg))                             # (bg, rows)
    rid = jax.lax.broadcasted_iota(jnp.int32, (bg, rows), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (bg, rows), 1) // p
    U = jnp.where(rid == cid, u_rep, 0.0).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        U, M, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (bg, W)


def _matsq(B):
    """Batched (bg, p, p) @ (bg, p, p) via p unrolled row contractions
    (Mosaic-friendly: slices + broadcasts only, no gathers; p <= 32)."""
    p = B.shape[1]
    rows = []
    for i in range(p):
        Bi = jnp.squeeze(B[:, i:i + 1, :], axis=1)        # (bg, p)
        rows.append(jnp.sum(B * Bi[:, :, None], axis=1))  # row i of B @ B
    return jnp.stack(rows, axis=1)


def _power(B, u, n_iters):
    """Dominant-eigenvector iteration with a shortened dependency chain.

    The plain loop is n_iters sequential (matvec, norm, select) triples of
    tiny (bg, p)-shaped ops — serial issue latency dominates on TPU.  Here
    the Gram is normalized (PSD: max entry = max diagonal, so the
    normalized spectral radius lies in [1, p]) and squared once, and each
    loop body applies B² twice without intermediate normalization
    (growth <= p^4 per body — safe in f32).  One body therefore advances
    four plain power steps: same Krylov direction, ~2x fewer sequential
    ops."""
    Babs = jnp.abs(B)
    bmax = jnp.max(jnp.max(Babs, axis=2, keepdims=True), axis=1,
                   keepdims=True)
    Bn = B / (bmax + _EPS)
    B2 = _matsq(Bn)

    def body(_, u):
        v = jnp.sum(B2 * u[:, None, :], axis=2)
        w = jnp.sum(B2 * v[:, None, :], axis=2)
        nrm = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
        return jnp.where(nrm > _EPS, w / (nrm + _EPS), u)

    n_bodies = max(1, n_iters // 4)
    return jax.lax.fori_loop(0, n_bodies, body, u)


def _power_warm(B, u, n_iters):
    """Warm-restart power steps: ``n_iters`` plain matvecs with a single
    final normalization.  For the Lagrangian loop's warm starts (u already
    near the Perron vector of a slightly-perturbed Gram) this replaces
    ``_power``'s normalize+square preamble — which costs ~p ops on the
    (bg, p, p) Gram and only pays off at cold-start iteration counts.

    No intermediate normalization: the Gram is first scaled by its max
    entry (spectral radius of the scaled matrix <= p), so u grows at most
    p^n_iters-fold — safe in f32 for the n_iters <= 4 range this is used
    at."""
    Babs = jnp.abs(B)
    bmax = jnp.max(jnp.max(Babs, axis=2, keepdims=True), axis=1,
                   keepdims=True)
    Bn = B / (bmax + _EPS)
    w = u
    for _ in range(n_iters):
        w = jnp.sum(Bn * w[:, None, :], axis=2)
    nrm = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
    return jnp.where(nrm > _EPS, w / (nrm + _EPS), u)


def _rank1(X, u0, n_iters, gram_mode="vpu", warm_plain=0):
    """Rank-1 fit of each gene block.  ``warm_plain > 0`` replaces the
    normalize+square power preamble with that many plain warm-restart
    matvecs (see ``_power_warm``) — only meaningful when ``u0`` is already
    near the answer (the Lagrangian loop's warm starts)."""
    if gram_mode in _PACKED_MODES:
        p, W = X.shape[1], X.shape[2]
        M = _pack_panel(X)
        B = _gram_from_groups(_slice_groups(M, p), p)
        u = (_power_warm(B, u0, warm_plain) if warm_plain
             else _power(B, u0, n_iters))
        Bu = jnp.sum(B * u[:, None, :], axis=2)
        s = jnp.sqrt(jnp.maximum(jnp.sum(u * Bu, axis=1), 0.0))
        v = (_v_from_panel(M, u, p) if gram_mode == "packed_bigv"
             else _v_from_groups(_slice_groups(M, p), u, p, W))
        v = v / (s[:, None] + _EPS)
        return u * s[:, None], v, u
    B = _gram_dispatch(X, gram_mode)
    u = (_power_warm(B, u0, warm_plain) if warm_plain
         else _power(B, u0, n_iters))
    Bu = jnp.sum(B * u[:, None, :], axis=2)
    s = jnp.sqrt(jnp.maximum(jnp.sum(u * Bu, axis=1), 0.0))   # (BG,)
    v = jnp.sum(X * u[:, :, None], axis=1) / (s[:, None] + _EPS)
    return u * s[:, None], v, u


def _rank1_uv(X, u0, n_iters, gram_mode="vpu", warm_plain=0):
    """Scale-free rank-1 state (u, v = Xᵀu) — no Rayleigh/sqrt/divide.

    Inside the Lagrangian loop est = K·E == u ⊗ (Xᵀu) exactly (the
    singular value cancels), so ``_rank1``'s per-iteration tail — the Bu
    matvec, the Rayleigh reduce + sqrt, the (BG, W)-sized divide of v and
    the u·s scale — is dead work on the serial-issue-bound chain (the
    streamed kernel, ops/pallas_stream.py, always worked this way).
    ``_finish_KE`` materializes K, E once after the loop."""
    if gram_mode in _PACKED_MODES:
        p, W = X.shape[1], X.shape[2]
        M = _pack_panel(X)
        B = _gram_from_groups(_slice_groups(M, p), p)
        u = (_power_warm(B, u0, warm_plain) if warm_plain
             else _power(B, u0, n_iters))
        if gram_mode == "packed_bigv":
            return u, _v_from_panel(M, u, p)
        return u, _v_from_groups(_slice_groups(M, p), u, p, W)
    B = _gram_dispatch(X, gram_mode)
    u = (_power_warm(B, u0, warm_plain) if warm_plain
         else _power(B, u0, n_iters))
    return u, jnp.sum(X * u[:, :, None], axis=1)


def _finish_KE(X, u, v, gram_mode, recompute_v=False):
    """Materialize (K, E) from a ``_rank1_uv`` loop state: s from the
    Rayleigh quotient of X's Gram, K = u·s; E = v/s for the f32 modes, or
    the f32 refinement pass for packed_slice (whose in-loop v rides bf16
    panels — same tail as the old per-iteration ``_rank1`` form, computed
    once per loop instead of once per iteration).

    ``recompute_v``: re-derive v = Xᵀu from THIS X instead of the carried
    v.  The bf16 lam-storage paths pass True: their carried v came from
    the last iteration's UNROUNDED X = A0 + lam while the X given here is
    rebuilt from the ROUNDED stored multipliers — recomputing keeps K and
    E a consistent rank-1 projection of one X state (K·E = u uᵀ X).  For
    the f32 paths the carried v is already bitwise-identical to Xᵀu, so
    recomputing would only add a block pass."""
    if gram_mode in _PACKED_MODES:
        B = _gram_from_groups(_pack_groups(X), X.shape[1])
    else:
        B = _gram_dispatch(X, gram_mode)
    Bu = jnp.sum(B * u[:, None, :], axis=2)
    s = jnp.sqrt(jnp.maximum(jnp.sum(u * Bu, axis=1), 0.0))
    K = u * s[:, None]
    if gram_mode in _PACKED_MODES:
        return K, _refine_E_f32(X, K, u)
    if recompute_v:
        v = jnp.sum(X * u[:, :, None], axis=1)
    return K, v / (s[:, None] + _EPS)


def _refine_E_f32(X, K, u):
    """One f32 pass recomputing E = X^T u / ||K|| (u is unit, so
    s = ||K||_2 exactly).  The packed modes' inner iterations read X only
    as a bf16 panel — fine for the self-correcting Lagrangian loop, but
    the RETURNED factors feed DI scores, so their E is refined to the f32
    class here (one extra block pass per loop, ~2% of the loop's traffic)."""
    s = jnp.sqrt(jnp.sum(K * K, axis=1))
    return jnp.sum(X * u[:, :, None], axis=1) / (s[:, None] + _EPS)


def _nmf_loop(A0, lam_ref, *, nmf_iter, power_cold, power_warm, gram_mode,
              warm_plain=0, u0=None, nmf_tol=0.0):
    """The full Lagrangian NMF-OA loop on a VMEM-resident block.

    ``lam_ref`` is a (BG, p, W) VMEM scratch reused across calls (the fused
    trim kernel calls this once per trim round).  With f32 storage it holds
    ``X = A0 + lambda`` directly (X-form): the reference's update

        lam <- max(lam - step*(est - A0), 0);  X = A0 + lam

    is algebraically  ``X <- max(X - step*(est - A0), A0)``  with X0 = A0 —
    one fewer block-sized VPU op per iteration, and the loop is VPU-
    throughput bound (measured 1.24x whole-kernel, tools/r2_xform_ab.py).
    f32-reassociation drift only; the XLA twin (core/nmf.py) uses the same
    form so kernel<->XLA parity is unaffected.  bf16 multiplier storage
    (EngineConfig.lam_dtype, opt-in) keeps the lambda-form: rounding X
    would scale the storage error by X's magnitude instead of lambda's.

    At ``nmf_tol == 0`` (the default) the loop carries the scale-free
    state (u, v = Xᵀu): est = K·E == u ⊗ v exactly (the singular value
    cancels), so the per-iteration Rayleigh/sqrt/divide/scale tail of
    ``_rank1`` is skipped and K, E materialize once via ``_finish_KE`` —
    the same shape the streamed kernel always had.  The XLA twin
    (core/nmf.py) is in lockstep.

    ``u0``: optional warm start for the cold rank-1 (the trim loop passes
    the previous round's left vectors with ``power_cold`` already reduced
    to EngineConfig.power_iters_resume).

    ``nmf_tol`` > 0 (EngineConfig.nmf_tol, opt-in): per-gene freeze of
    (X, K, E, u) once max|ΔK| <= nmf_tol * max|K| in one iteration, with
    block-level early exit when every gene has frozen.  Freezing gates the
    X/lambda scratch write too, so the packed modes' final f32 E
    refinement reads each gene's X exactly as frozen — results are
    invariant to gene-block partitioning and match the XLA twin
    (core/nmf.py's adaptive while_loop): both compute the same candidate
    update each iteration and discard it for frozen genes."""
    BG, p, W = A0.shape
    if u0 is None:
        u0 = jnp.full((BG, p), 1.0 / (p ** 0.5), A0.dtype)

    step = 1.0 / (nmf_iter ** 0.5)
    lam_form = lam_ref.dtype != A0.dtype          # bf16 opt-in storage

    if nmf_tol <= 0:
        # Scale-free fast path: carry (u, v = Xᵀu) — est = K·E == u ⊗ v
        # exactly, so _rank1's per-iteration Rayleigh/sqrt/divide/scale
        # tail is skipped; _finish_KE materializes K, E once at the end.
        # (The adaptive nmf_tol path below keeps the (K, E, u) carry: its
        # per-gene freeze test is defined on K = u·s.)
        u, v = _rank1_uv(A0, u0, power_cold, gram_mode)

        if lam_form:
            lam_ref[:] = jnp.zeros(lam_ref.shape, lam_ref.dtype)

            def body_uv(_, carry):
                # The multipliers are STORED bf16 (EngineConfig.lam_dtype)
                # — the update runs f32 and the unrounded value feeds this
                # iteration's X, so rounding enters once per iteration.
                u, v = carry
                est = u[:, :, None] * v[:, None, :]
                lam = jnp.maximum(
                    lam_ref[:].astype(A0.dtype) - step * (est - A0), 0.0)
                lam_ref[:] = lam.astype(lam_ref.dtype)
                return _rank1_uv(A0 + lam, u, power_warm, gram_mode,
                                 warm_plain=warm_plain)
        else:
            lam_ref[:] = A0

            def body_uv(_, carry):
                u, v = carry
                est = u[:, :, None] * v[:, None, :]
                X = jnp.maximum(lam_ref[:] - step * (est - A0), A0)
                lam_ref[:] = X
                return _rank1_uv(X, u, power_warm, gram_mode,
                                 warm_plain=warm_plain)

        u, v = jax.lax.fori_loop(0, nmf_iter, body_uv, (u, v))
        X_fin = (A0 + lam_ref[:].astype(A0.dtype) if lam_form
                 else lam_ref[:])
        K, E = _finish_KE(X_fin, u, v, gram_mode, recompute_v=lam_form)
        return K, E, u

    K, E, u = _rank1(A0, u0, power_cold, gram_mode)

    if lam_form:
        lam_ref[:] = jnp.zeros(lam_ref.shape, lam_ref.dtype)

        def body_frozen(carry):
            K, E, u, done = carry
            est = K[:, :, None] * E[:, None, :]
            lam_old = lam_ref[:]
            lam = jnp.maximum(
                lam_old.astype(A0.dtype) - step * (est - A0), 0.0)
            lam_ref[:] = jnp.where(done[:, :, None] > 0, lam_old,
                                   lam.astype(lam_ref.dtype))
            return _rank1(A0 + lam, u, power_warm, gram_mode,
                          warm_plain=warm_plain)
    else:
        lam_ref[:] = A0

        def body_frozen(carry):
            K, E, u, done = carry
            X_old = lam_ref[:]
            est = K[:, :, None] * E[:, None, :]
            X = jnp.maximum(X_old - step * (est - A0), A0)
            lam_ref[:] = jnp.where(done[:, :, None] > 0, X_old, X)
            return _rank1(X, u, power_warm, gram_mode,
                          warm_plain=warm_plain)

    # Adaptive convergence: the freeze test and masking mirror
    # core/nmf.py's adaptive while_loop exactly — a frozen gene's
    # consumed state never changes (the candidate rank-1 still runs on
    # all genes; its result is discarded for frozen ones, like the XLA
    # twin's jnp.where masking).  ``done`` rides as a {0,1} (BG, 1)
    # float column — Mosaic vectorizes f32 selects on every shape here.
    tol = jnp.asarray(nmf_tol, A0.dtype)

    def cond_a(carry):
        i, K, E, u, done = carry
        return (i < nmf_iter) & (jnp.min(done) < 0.5)

    def body_a(carry):
        i, K, E, u, done = carry
        Kn, En, un = body_frozen((K, E, u, done))
        Kn = jnp.where(done > 0, K, Kn)
        En = jnp.where(done > 0, E, En)
        un = jnp.where(done > 0, u, un)
        delta = jnp.max(jnp.abs(Kn - K), axis=1, keepdims=True)
        ref = jnp.maximum(jnp.max(jnp.abs(Kn), axis=1, keepdims=True),
                          1e-30)
        done = jnp.maximum(done, (delta <= tol * ref).astype(A0.dtype))
        return i + 1, Kn, En, un, done

    carry = (jnp.zeros((), jnp.int32), K, E, u,
             jnp.zeros((BG, 1), A0.dtype))
    _, K, E, u, _ = jax.lax.while_loop(cond_a, body_a, carry)
    if gram_mode in _PACKED_MODES:
        X_fin = (A0 + lam_ref[:].astype(A0.dtype) if lam_form
                 else lam_ref[:])
        E = _refine_E_f32(X_fin, K, u)
    return K, E, u


def _nmf_kernel(act_ref, a0_ref, u0_ref, k_ref, e_ref, u_ref, lam_ref, *,
                nmf_iter, power_cold, power_warm, gram_mode, warm_plain=0,
                resume=False, nmf_tol=0.0):
    # Block-level early exit: the trim loop calls this with shrinking
    # per-gene active sets; a block whose genes are all inactive skips the
    # entire Lagrangian loop (outputs zeroed — callers gate on their own
    # active masks, so the values are never consumed).
    k_ref[:] = jnp.zeros(k_ref.shape, k_ref.dtype)
    e_ref[:] = jnp.zeros(e_ref.shape, e_ref.dtype)
    u_ref[:] = jnp.zeros(u_ref.shape, u_ref.dtype)

    @pl.when(jnp.max(act_ref[:]) > 0)
    def _():
        K, E, u = _nmf_loop(a0_ref[:], lam_ref, nmf_iter=nmf_iter,
                            power_cold=power_cold, power_warm=power_warm,
                            gram_mode=gram_mode, warm_plain=warm_plain,
                            u0=u0_ref[:] if resume else None,
                            nmf_tol=nmf_tol)
        k_ref[:] = K
        e_ref[:] = E
        u_ref[:] = u


def _ratio_kernel(a0_ref, cs_ref, es_ref, *, power_cold, gram_mode):
    """Fused ratio-SVD row sums (reference nmf.py:109-121,522-526): one
    rank-1 fit, clip est up to F, and both row sums — one VMEM pass."""
    A0 = a0_ref[:]                                      # (bg, p, W)
    BG, p, W = A0.shape
    u0 = jnp.full((BG, p), 1.0 / (p ** 0.5), A0.dtype)
    K, E, u = _rank1(A0, u0, power_cold, gram_mode)
    if gram_mode in _PACKED_MODES:
        E = _refine_E_f32(A0, K, u)
    est = jnp.maximum(K[:, :, None] * E[:, None, :], A0)
    # Unmasked sums are exact: E inherits the column mask through
    # v = A0ᵀu (masked columns of A0 are zero ⇒ E_w = 0 ⇒ est_w = 0).
    cs_ref[:] = jnp.sum(A0, axis=2)
    es_ref[:] = jnp.sum(est, axis=2)


def ratio_rowsums_pallas(
    F: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    power_iters: int = 30,
    gram_mode: str = "auto",
    interpret: bool = False,
    vmem_frac: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused Pallas path of core.nmf.ratio_svd_rowsums (same numerics up to
    f32 reduction order)."""
    G, p, W = F.shape
    A0 = F * mask.astype(F.dtype)[:, None, :]
    if gram_mode == "auto":
        gram_mode = "vpu" if interpret else "packed_slice"
    bg = pick_block_genes(G, p, W, vmem_frac=vmem_frac)
    G_pad = ((G + bg - 1) // bg) * bg
    if G_pad != G:
        A0 = jnp.pad(A0, ((0, G_pad - G), (0, 0), (0, 0)))
    kernel = functools.partial(_ratio_kernel, power_cold=power_iters,
                               gram_mode=gram_mode)
    cs, es = pl.pallas_call(
        kernel,
        grid=(G_pad // bg,),
        in_specs=[pl.BlockSpec((bg, p, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G_pad, p), F.dtype),
            jax.ShapeDtypeStruct((G_pad, p), F.dtype),
        ),
        interpret=interpret,
    )(A0)
    return cs[:G], es[:G]


def _resolve_lam_dtype(lam_dtype: str, p: int, interpret: bool):
    """EngineConfig.lam_dtype -> storage dtype of the multiplier scratch.
    "auto" currently keeps f32: the engine-level A/B (tools/lam_ab.py)
    measured NO steady-iteration win from bf16 storage at p=16/32 (the
    loop is not multiplier-traffic bound there), so the precision cost
    isn't paid by default.  "bf16" opts in explicitly."""
    del p, interpret
    return jnp.bfloat16 if lam_dtype == "bf16" else jnp.float32


def pick_block_genes(G: int, p: int, W: int, dtype_bytes: int = 4,
                     lam_bf16: bool = False, vmem_frac: float = 1.0) -> int:
    """Largest gene-block whose working set (~_nmf_blocks(p) live (bg, p, W)
    buffers: double-buffered A0, lambda, est/X transients, Gram packing)
    fits the VMEM budget.  Must be a multiple of 8: the gene axis is the
    second-to-last dim of the (bg, p)/(bg, W) output blocks and TPU tiling
    requires sublane divisibility.  ``lam_bf16`` halves the lambda
    scratch's share of the budget.  ``vmem_frac`` scales the budget down —
    the engine's soft retry after a scoped-VMEM compile failure
    (EngineConfig.vmem_frac)."""
    per_gene = int(_nmf_blocks(p) * p * W * dtype_bytes)
    if lam_bf16:
        per_gene -= p * W * dtype_bytes // 2
    bg = (int(_VMEM_BUDGET * vmem_frac) // per_gene) // 8 * 8
    # Compile-complexity cap: the packed-Gram path unrolls O(bg) slice
    # extractions per rank-1 call site, and narrow buckets (W=256/512)
    # would otherwise get bg ~ 200+ — observed to crash the TPU compile
    # service deterministically (whole-pipeline runs at 20k real genes;
    # the halved-block retry at bg~112 compiled fine) and to take
    # minutes-long compiles even when it survives.  64 is the bench
    # shapes' class; beyond it larger blocks buy no throughput (the grid
    # just has fewer, bigger steps).
    bg = min(bg, 64)
    return int(max(8, min(bg, ((G + 7) // 8) * 8)))


def nmf_masked_pallas(
    F: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    nmf_iter: int,
    power_iters_cold: int = 30,
    power_iters_warm: int = 6,
    block_genes: Optional[int] = None,
    interpret: bool = False,
    gene_active: Optional[jnp.ndarray] = None,
    gram_mode: str = "auto",
    power_warm_plain: int = 0,
    u0: Optional[jnp.ndarray] = None,
    lam_dtype: str = "auto",
    vmem_frac: float = 1.0,
    nmf_tol: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for core.nmf.nmf_masked (method="power").

    ``nmf_tol`` > 0: per-gene adaptive freeze + block-level early exit,
    matching the XLA twin's adaptive while_loop (see _nmf_loop).

    ``u0``: optional (G, p) warm start for the cold rank-1 (trim-round
    resume — pass power_iters_cold already reduced accordingly).

    ``gene_active``: optional (G,) bool — gene blocks whose genes are all
    inactive skip the entire loop (their outputs are zeros; callers must
    gate on their own active masks, which they already do for every state
    update in the trim loop).

    ``gram_mode``: "vpu" (row reductions), "mxu" (gene-packed f32 matmul),
    "mxu_bf16" (bf16 products, f32 accumulation), "packed_slice"
    (mxu_bf16 gram + MXU v-contraction from the same bf16 panel), or
    "auto".

    ``power_warm_plain``: > 0 replaces the squared-operator warm power
    scheme with this many plain warm-restart matvecs (see _power_warm)."""
    G, p, W = F.shape
    A0 = F * mask.astype(F.dtype)[:, None, :]
    lam_jdtype = _resolve_lam_dtype(lam_dtype, p, interpret)
    bg = block_genes or pick_block_genes(
        G, p, W, lam_bf16=lam_jdtype == jnp.bfloat16, vmem_frac=vmem_frac)
    # pad G to a multiple of the block size (zero genes are harmless)
    G_pad = ((G + bg - 1) // bg) * bg
    if G_pad != G:
        A0 = jnp.pad(A0, ((0, G_pad - G), (0, 0), (0, 0)))
    if gene_active is None:
        act = jnp.ones((G_pad, 1), F.dtype)
    else:
        act = jnp.pad(gene_active.astype(F.dtype), (0, G_pad - G))[:, None]
    resume = u0 is not None
    u0_arr = (jnp.pad(u0.astype(F.dtype), ((0, G_pad - G), (0, 0)))
              if resume else jnp.zeros((G_pad, p), F.dtype))

    if gram_mode == "auto":
        # packed_slice: bf16 MXU Gram + MXU v-contraction from one shared
        # bf16 row panel (X never materializes in f32 inside the loop; the
        # returned E gets one f32 refinement pass). Engine-level DI drift
        # vs the vpu/f32 path is the same class as mxu_bf16 (mean ~1e-4,
        # tools/engine_mode_ab.py) at ~1.4x the speed. Interpret mode
        # keeps the VPU form (the interpreter's matmul emulation is slow
        # and tests compare against the XLA f32 path).
        gram_mode = "vpu" if interpret else "packed_slice"
    kernel = functools.partial(
        _nmf_kernel, nmf_iter=nmf_iter, power_cold=power_iters_cold,
        power_warm=power_iters_warm, gram_mode=gram_mode,
        warm_plain=power_warm_plain, resume=resume,
        nmf_tol=float(nmf_tol))

    K, E, u = pl.pallas_call(
        kernel,
        grid=(G_pad // bg,),
        in_specs=[
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G_pad, p), F.dtype),
            jax.ShapeDtypeStruct((G_pad, W), F.dtype),
            jax.ShapeDtypeStruct((G_pad, p), F.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bg, p, W), lam_jdtype)],
        interpret=interpret,
    )(act, A0, u0_arr)
    return K[:G], E[:G], u[:G]


def pallas_supported(F_shape, dtype) -> bool:
    """Pallas path prerequisites: float32, and a minimal 8-gene block's
    working set fits VMEM."""
    G, p, W = F_shape
    return (jnp.dtype(dtype) == jnp.float32
            and W % 128 == 0
            and 8 * _nmf_blocks(p) * p * W * 4 <= _VMEM_BUDGET)
