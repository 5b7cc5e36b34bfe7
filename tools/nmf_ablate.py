"""Cost breakdown of the fused NMF Lagrangian loop (ops/pallas_nmf.py).

Times surgical variants of the production kernel with individual stages
disabled (numerics intentionally wrong — timing only), to attribute the
per-iteration cost between: the Gram contraction, the power-iteration
chain, the v/E recompute, and the elementwise lambda update. Variants are
jit-wrapped and dependency-chained (axon relay: un-chained micro-timings
are unreliable — CLAUDE.md).

Usage: python tools/nmf_ablate.py [P [W [BG_TOTAL]]]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from degnorm_tpu.ops.pallas_nmf import (_EPS, _gram_dispatch, _power,
                                        pick_block_genes)

P = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
G = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
NMF_ITER = 50
POWER_COLD, POWER_WARM = 30, 6
GRAM = "mxu_bf16"
REPS = 10


def _rank1_var(X, u0, n_iters, *, skip_gram=None, skip_power=False,
               skip_v=False, E_prev=None):
    B = skip_gram if skip_gram is not None else _gram_dispatch(X, GRAM)
    u = u0 if skip_power else _power(B, u0, n_iters)
    Bu = jnp.sum(B * u[:, None, :], axis=2)
    s = jnp.sqrt(jnp.maximum(jnp.sum(u * Bu, axis=1), 0.0))
    if skip_v:
        v = E_prev
    else:
        v = jnp.sum(X * u[:, :, None], axis=1) / (s[:, None] + _EPS)
    return u * s[:, None], v, u


def make_kernel(variant):
    def kernel(a0_ref, k_ref, e_ref, lam_ref):
        A0 = a0_ref[:]
        BG, p, Wb = A0.shape
        u0 = jnp.full((BG, p), 1.0 / (p ** 0.5), A0.dtype)
        K, E, u = _rank1_var(A0, u0, POWER_COLD)
        lam_ref[:] = jnp.zeros_like(A0)
        B_frozen = _gram_dispatch(A0, GRAM)
        step = 1.0 / (NMF_ITER ** 0.5)

        def body(_, carry):
            K, E, u = carry
            if variant == "no_est":
                lam = jnp.maximum(lam_ref[:] + step * A0, 0.0)
            else:
                est = K[:, :, None] * E[:, None, :]
                lam = jnp.maximum(lam_ref[:] - step * (est - A0), 0.0)
            lam_ref[:] = lam
            X = A0 + lam
            kw = {}
            if variant == "no_gram":
                kw["skip_gram"] = B_frozen
            if variant == "no_power":
                kw["skip_power"] = True
            if variant == "no_v":
                kw["skip_v"] = True
                kw["E_prev"] = E
            return _rank1_var(X, u, POWER_WARM, **kw)

        K, E, u = jax.lax.fori_loop(0, NMF_ITER, body, (K, E, u))
        k_ref[:] = K
        e_ref[:] = E
    return kernel


def run(variant):
    bg = pick_block_genes(G, P, W)
    G_pad = ((G + bg - 1) // bg) * bg
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, W)
    base = np.abs(np.sin(np.pi * t) + 0.2)[None, None, :]
    F = jnp.asarray((base * (0.5 + rng.random((G_pad, P, 1))) * 40
                     ).astype(np.float32))

    call = pl.pallas_call(
        make_kernel(variant),
        grid=(G_pad // bg,),
        in_specs=[pl.BlockSpec((bg, P, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bg, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((G_pad, W), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bg, P, W), jnp.float32)],
    )

    @jax.jit
    def step(f):
        K, E = call(f)
        return K, E, f + K[0, 0] * 1e-30

    K, E, f = step(F)
    np.asarray(K)
    t0 = time.perf_counter()
    f = F
    for _ in range(REPS):
        K, E, f = step(f)
    np.asarray(K)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{variant:>10s}: {dt*1e3:6.1f} ms/call  (bg={bg})", flush=True)
    return dt


if __name__ == "__main__":
    print(f"G={G} P={P} W={W} nmf_iter={NMF_ITER} gram={GRAM} "
          f"power={POWER_COLD}/{POWER_WARM}")
    base = run("base")
    for v in ("no_gram", "no_power", "no_v", "no_est"):
        dt = run(v)
        print(f"           -> {v} saves {(base-dt)*1e3:5.1f} ms "
              f"({100*(base-dt)/base:4.1f}% of base)")
