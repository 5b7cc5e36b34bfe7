"""Kernel sensitivity scan: what bounds the fused NMF Lagrangian loop?

Splits the per-call cost into fixed-vs-per-iteration parts (nmf_iter scan),
issue-overhead amortization (block-size scan), and the power-chain share
(warm_plain scan).  Dependency-chained timing (CLAUDE.md).

Usage: python tools/r2_kernel_scan.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np

REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from degnorm_tpu.ops.pallas_nmf import nmf_masked_pallas

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[scan] device session: {time.perf_counter() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    G, p, W = 2048, 8, 1024
    t = np.linspace(0, 1, W)
    base = np.abs(np.sin(np.pi * t) + 0.2)[None, None, :]
    F = jnp.asarray((base * (0.5 + rng.random((G, p, 1))) * 40
                     ).astype(np.float32))
    mask = jnp.ones((G, W), bool)

    def timeit(label, **kw):
        @functools.partial(jax.jit, static_argnames=tuple(kw.keys()))
        def step(f, **kw2):
            K, E, u = nmf_masked_pallas(
                f, mask,
                power_iters_cold=kw2.pop("power_iters_cold", 128),
                power_iters_warm=24, gram_mode="packed_slice",
                **kw2)
            return K, f + K[0, 0] * 1e-30

        K, f = step(F, **kw)
        np.asarray(K)
        t0 = time.perf_counter()
        f = F
        for _ in range(REPS):
            K, f = step(f, **kw)
        np.asarray(K)
        dt = (time.perf_counter() - t0) / REPS
        print(f"[scan] {label:>40s}: {dt*1e3:6.2f} ms/call", flush=True)
        return dt

    # per-iteration vs fixed cost
    for ni in (25, 50, 100):
        timeit(f"nmf_iter={ni}", nmf_iter=ni, power_warm_plain=4)
    # block-size amortization (default bg = 56 here)
    for bg in (16, 32, 56):
        timeit(f"nmf_iter=50 bg={bg}", nmf_iter=50, power_warm_plain=4,
               block_genes=bg)
    # power-chain share
    for wp in (1, 2, 4, 8):
        timeit(f"nmf_iter=50 warm_plain={wp}", nmf_iter=50,
               power_warm_plain=wp)
    # cold-start share
    for pc in (32, 128):
        timeit(f"nmf_iter=50 cold={pc}", nmf_iter=50, power_warm_plain=4,
               power_iters_cold=pc)


if __name__ == "__main__":
    main()
