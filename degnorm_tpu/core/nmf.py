"""Batched masked NMF-over-approximation inner loop.

Device equivalent of the reference's per-gene ``GeneNMFOA.nmf``
(``degnorm/nmf.py:78-107``): a clipped-Lagrangian fixed point that
repeatedly refits a rank-1 factorization to ``x + lambda``.  Runs for a whole
(G, p, W) gene bucket at once under ``lax.fori_loop``; masked columns carry
zero coverage and zero multipliers throughout, which is exact (the rank-1
factors of [A | 0] are those of A — see core/linalg.py).

The final over-approximation clip is intentionally NOT applied here: the
reference comments it out inside ``nmf`` (nmf.py:104-106) and clips
selectively at call sites (nmf.py:318,345,352,365).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from degnorm_tpu.core.linalg import (finish_rank_one, masked_rank_one,
                                     masked_rank_one_uv, outer_product)


def nmf_masked(
    F: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    nmf_iter: int,
    power_iters_cold: int = 30,
    power_iters_warm: int = 6,
    method: str = "power",
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gene_active=None,
    gram_mode: str = "auto",
    power_warm_plain: int = 0,
    u0: Optional[jnp.ndarray] = None,
    lam_dtype: str = "auto",
    stream: bool = True,
    F_raw: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
    vmem_frac: float = 1.0,
    nmf_tol: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the NMF-OA loop on a masked gene bucket.

    Args:
      F: (G, p, W) nonnegative coverage batch (already scale-adjusted).
      mask: (G, W) active-column mask.
      nmf_iter: number of Lagrangian iterations (reference ``nmf_iter``).
      use_pallas: route through the fused VMEM-resident TPU kernel
        (ops/pallas_nmf.py) when shapes/dtype allow.
      gene_active: optional (G,) bool; on the Pallas path, gene blocks with
        no active genes skip the loop entirely (outputs zeroed — callers
        must gate every consumer on their own masks, as the trim loop
        does). The XLA path computes all genes regardless.
      u0: optional (G, p) warm start for the initial cold rank-1 (the trim
        loop resumes from the previous round's left vectors with a reduced
        power_iters_cold — the Perron fixed point is unchanged).
      F_raw/scale: the engine's raw device-resident coverage (typically
        int16) and the per-sample scale vector with F == F_raw/scale; the
        streamed kernel then reads F_raw at half the HBM bytes and adjusts
        per chunk, bit-identically (see ops/pallas_stream.py).
      nmf_tol: > 0 enables OPT-IN adaptive convergence (EngineConfig.
        nmf_tol): each gene freezes its (X, K, E, u) once max|ΔK| <=
        nmf_tol * max|K| in one iteration, and the loop exits early when
        all genes are frozen.  Per-gene freezing makes results invariant
        to batching and identical to the fused kernel's (the Pallas twin
        implements the same freeze in ops/pallas_nmf.py::_nmf_loop; parity
        at nmf_tol > 0 is tested in tests/test_pallas.py).  The streamed
        fallback ignores it (wide buckets run the full nmf_iter).

    Returns (K, E, u): rank-1 factors (G,p), (G,W) and the final unit left
    vector for warm starts. K, E are nonnegative (Perron orientation);
    their product matches the reference's signed factors' product.
    """
    if use_pallas and method == "power":
        from degnorm_tpu.ops.pallas_nmf import (nmf_masked_pallas,
                                                pallas_supported)
        if pallas_supported(F.shape, F.dtype):
            return nmf_masked_pallas(
                F, mask, nmf_iter=nmf_iter,
                power_iters_cold=power_iters_cold,
                power_iters_warm=power_iters_warm,
                interpret=pallas_interpret,
                gene_active=gene_active,
                gram_mode=gram_mode,
                power_warm_plain=power_warm_plain,
                u0=u0,
                lam_dtype=lam_dtype,
                vmem_frac=vmem_frac,
                nmf_tol=nmf_tol)
        # Too wide for VMEM residency: stream W-chunks through VMEM with
        # the multipliers HBM-resident (ops/pallas_stream.py) rather than
        # dropping to the XLA lowering.  The streamed kernel stores f32
        # multipliers, so an explicit bf16 opt-in keeps the XLA fallback.
        if stream and lam_dtype != "bf16":
            from degnorm_tpu.ops.pallas_stream import (nmf_masked_streamed,
                                                       streamed_supported)
            if streamed_supported(F.shape, F.dtype):
                use_raw = F_raw is not None and scale is not None
                return nmf_masked_streamed(
                    F_raw if use_raw else F, mask, nmf_iter=nmf_iter,
                    power_iters_cold=power_iters_cold,
                    power_iters_warm=power_iters_warm,
                    interpret=pallas_interpret,
                    gene_active=gene_active,
                    gram_mode=gram_mode,
                    power_warm_plain=power_warm_plain,
                    u0=u0,
                    scale=scale if use_raw else None)

    m = mask.astype(F.dtype)
    A0 = F * m[:, None, :]

    step = 1.0 / jnp.sqrt(jnp.asarray(nmf_iter, F.dtype))

    # X-form of the multiplier update (kept in lockstep with the fused
    # kernel, ops/pallas_nmf.py::_nmf_loop): carrying X = A0 + lambda
    # directly, the reference's  lam <- max(lam - step*(est - A0), 0)
    # becomes  X <- max(X - step*(est - A0), A0)  — identical over the
    # reals, one fewer elementwise pass on device; floating-point drift is
    # reassociation-class only.  Masked columns stay exactly zero (est and
    # A0 both vanish there, so max(0 - 0, 0) = 0).
    #
    # Scale-free carry (also in lockstep with the fused kernel and the
    # streamed kernel, which always worked this way): est = K·E ==
    # u ⊗ (Xᵀu) exactly — the singular value cancels — so the loop carries
    # (u, v = Xᵀu) and skips masked_rank_one's per-iteration Rayleigh/
    # sqrt/divide tail; K, E materialize once after the loop.
    def body(_, carry):
        X, K, E, u = carry
        est = outer_product(K, E)
        X = jnp.maximum(X - step * (est - A0), A0)
        K, E, u = masked_rank_one(X, mask, n_iters=power_iters_warm,
                                  u0=u, method=method)
        return X, K, E, u

    if nmf_tol > 0:
        K, E, u = masked_rank_one(F, mask, n_iters=power_iters_cold,
                                  method=method, u0=u0)
        # Adaptive convergence (EngineConfig.nmf_tol, opt-in): per-gene
        # freeze + all-frozen early exit.  A frozen gene's state stops
        # updating entirely (X included — its packed-kernel twin refines E
        # from the frozen X), so values depend only on each gene's own
        # history: invariant to batching, identical to the fused kernel.
        tol = jnp.asarray(nmf_tol, F.dtype)

        def cond_a(carry):
            i, X, K, E, u, done = carry
            return (i < nmf_iter) & ~jnp.all(done)

        def body_a(carry):
            i, X, K, E, u, done = carry
            Xn, Kn, En, un = body(i, (X, K, E, u))
            X = jnp.where(done[:, None, None], X, Xn)
            Kn = jnp.where(done[:, None], K, Kn)
            En = jnp.where(done[:, None], E, En)
            un = jnp.where(done[:, None], u, un)
            delta = jnp.max(jnp.abs(Kn - K), axis=1)
            ref = jnp.maximum(jnp.max(jnp.abs(Kn), axis=1), 1e-30)
            done = done | (delta <= tol * ref)
            return i + 1, X, Kn, En, un, done

        carry = (jnp.zeros((), jnp.int32), A0, K, E, u,
                 jnp.zeros((F.shape[0],), bool))
        _, X, K, E, u, _ = jax.lax.while_loop(cond_a, body_a, carry)
        return K, E, u

    u, v = masked_rank_one_uv(F, mask, n_iters=power_iters_cold,
                              method=method, u0=u0)

    def body_uv(_, carry):
        X, u, v = carry
        est = outer_product(u, v)
        X = jnp.maximum(X - step * (est - A0), A0)
        u, v = masked_rank_one_uv(X, mask, n_iters=power_iters_warm,
                                  u0=u, method=method)
        return X, u, v

    X, u, v = jax.lax.fori_loop(0, nmf_iter, body_uv, (A0, u, v))
    K, E = finish_rank_one(X, mask, u, v)
    return K, E, u


def ratio_svd_rowsums(
    F: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    power_iters: int = 30,
    method: str = "power",
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "auto",
    vmem_frac: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row sums of the one-shot clipped rank-1 over-approximation.

    Device version of reference ``ratio_svd`` (nmf.py:109-121) returning only
    what DegNorm initialization needs (nmf.py:522-526): per-sample sums of
    max(K·E, F) and of F, both over active columns.
    """
    if use_pallas and method == "power":
        from degnorm_tpu.ops.pallas_nmf import (pallas_supported,
                                                ratio_rowsums_pallas)
        if pallas_supported(F.shape, F.dtype):
            return ratio_rowsums_pallas(F, mask, power_iters=power_iters,
                                        gram_mode=gram_mode,
                                        interpret=pallas_interpret,
                                        vmem_frac=vmem_frac)
    m = mask.astype(F.dtype)
    K, E, _ = masked_rank_one(F, mask, n_iters=power_iters, method=method)
    est = jnp.maximum(outer_product(K, E), F * m[:, None, :])
    est_sums = jnp.einsum("gpw,gw->gp", est, m)
    cov_sums = jnp.einsum("gpw,gw->gp", F, m)
    return cov_sums, est_sums
