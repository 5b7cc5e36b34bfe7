"""Sequence-parallel (column-sharded) rank-1 / NMF-OA kernels.

The reference cannot handle very long genes on one worker: it *shrinks*
the length axis by systematic downsampling and hard-caps genes at 9 Mb
(SURVEY.md §5.7; reference nmf.py:408-453, __main_mpi__.py:374).  Here the
position axis is treated like a sequence axis and sharded across devices:
every reduction the algorithm needs — row sums, column maxes, and the
rank-1 power iteration's Gram matrix — is column-partitionable, so the
whole Lagrangian loop runs with exactly ONE psum (the p x p Gram) per
rank-1 refit; Lagrange multipliers and estimates never leave their shard.

This is the context-parallel analog of ring attention for DegNorm's
workload: communication is O(p²) per matvec regardless of gene length.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_EPS = 1e-30


def _power(B, u0, n_iters):
    # squared-operator pair stepping, matching core/linalg.py::_power_iterate
    bmax = jnp.max(jnp.abs(B), axis=(1, 2), keepdims=True)
    Bn = B / (bmax + _EPS)
    B2 = jnp.einsum("gik,gkj->gij", Bn, Bn)

    def body(_, u):
        v = jnp.einsum("gpq,gq->gp", B2, u)
        w = jnp.einsum("gpq,gq->gp", B2, v)
        nrm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        return jnp.where(nrm > _EPS, w / (nrm + _EPS), u)

    return jax.lax.fori_loop(0, max(1, n_iters // 4), body, u0)


def _rank1_sharded(A, u0, n_iters, axis):
    """Rank-1 factors of column-sharded A: local Gram + one psum."""
    B = jax.lax.psum(jnp.einsum("gpw,gqw->gpq", A, A), axis)
    u = _power(B, u0, n_iters)
    Bu = jnp.einsum("gpq,gq->gp", B, u)
    s = jnp.sqrt(jnp.maximum(jnp.einsum("gp,gp->g", u, Bu), 0.0))
    v = jnp.einsum("gpw,gp->gw", A, u) / (s[:, None] + _EPS)   # local shard
    return u * s[:, None], v, u


def _nmf_local(F, mask, *, nmf_iter, power_cold, power_warm, axis):
    m = mask.astype(F.dtype)
    A0 = F * m[:, None, :]
    G, p, _ = F.shape
    u0 = jnp.full((G, p), 1.0 / jnp.sqrt(jnp.asarray(p, F.dtype)), F.dtype)

    K, E, u = _rank1_sharded(A0, u0, power_cold, axis)
    lam = jnp.zeros_like(A0)
    step = 1.0 / jnp.sqrt(jnp.asarray(nmf_iter, F.dtype))

    def body(_, carry):
        lam, K, E, u = carry
        est = K[:, :, None] * E[:, None, :]
        lam = jnp.maximum(lam - step * (est - A0), 0.0)
        K, E, u = _rank1_sharded(A0 + lam, u, power_warm, axis)
        return lam, K, E, u

    lam, K, E, u = jax.lax.fori_loop(0, nmf_iter, body, (lam, K, E, u))
    return K, E, u


def nmf_masked_seqparallel(
    F: jnp.ndarray,
    mask: jnp.ndarray,
    mesh: Mesh,
    *,
    nmf_iter: int,
    power_iters_cold: int = 30,
    power_iters_warm: int = 6,
    axis: str = "genes",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMF-OA with the position axis sharded over ``mesh``'s ``axis``.

    F: (G, p, W) with W divisible by the mesh size; mask: (G, W).
    Returns (K, E, u) — K and u replicated, E sharded like the input.
    Numerics identical to core.nmf.nmf_masked (one psum per Gram).
    """
    fn = shard_map(
        functools.partial(_nmf_local, nmf_iter=nmf_iter,
                          power_cold=power_iters_cold,
                          power_warm=power_iters_warm, axis=axis),
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=(P(None, None), P(None, axis), P(None, None)),
        check_rep=False,
    )
    return fn(F, mask)


def shard_columns(x: jnp.ndarray, mesh: Mesh, axis: str = "genes"):
    """Place an array with its LAST dim sharded across the mesh."""
    spec = P(*([None] * (x.ndim - 1) + [axis]))
    return jax.device_put(x, NamedSharding(mesh, spec))
