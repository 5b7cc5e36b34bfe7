"""Trim-kernel cost attribution on a dense (bench-like) workload.

Times baseline_select_bucket end-to-end on a degraded bucket while varying
nmf_iter (per-inner-iteration marginal), power_iters_resume (per-round
power share), and trim fusion — plus rounds_active stats so the marginal
can be normalized per block-round.  Dependency-chained timing.

Usage: python tools/r2_trim_scan.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import functools
import time

import numpy as np

REPS = 5
G, P, W = 2048, 8, 1024


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.core.baseline import baseline_select_bucket

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[trim] device session: {time.perf_counter() - t0:.1f}s",
          flush=True)

    # dense degraded coverage like bench's synth (every gene trims)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, W)[None, None, :]
    base = np.abs(np.sin(np.pi * t) + 0.2)
    amp = 0.5 + rng.random((G, P, 1)) * 1.5
    dec = np.exp(-2.0 * (1 - t) * rng.random((G, P, 1)))
    odd = (np.arange(P) % 2 == 1)[None, :, None]
    m = amp * 8 * base * np.where(odd, dec, 1.0)
    F = jnp.asarray(np.round(np.maximum(m, 0) * 20).astype(np.float32))
    mask = jnp.ones((G, W), bool)

    @functools.partial(jax.jit, static_argnames=("cfg", "eng"))
    def step(f, cfg, eng):
        r = baseline_select_bucket(f, mask, cfg, eng, with_estimates=False)
        return r.rho, r.rounds_active, f + r.rho[0, 0] * 1e-30

    def timeit(label, cfg, eng):
        rho, ra, f = step(F, cfg, eng)
        np.asarray(rho)
        t0 = time.perf_counter()
        f = F
        for _ in range(REPS):
            rho, ra, f = step(f, cfg, eng)
        np.asarray(rho)
        dt = (time.perf_counter() - t0) / REPS
        ra = np.asarray(ra)
        print(f"[trim] {label:>38s}: {dt*1e3:7.1f} ms/call  "
              f"rounds mean {ra.mean():.1f} max {ra.max()}", flush=True)
        return dt

    eng = EngineConfig()
    for ni in (25, 50, 100):
        timeit(f"fused nmf_iter={ni}", NMFConfig(nmf_iter=ni), eng)
    for pr in (8, 32, 128):
        timeit(f"fused nmf50 resume={pr}", NMFConfig(nmf_iter=50),
               dataclasses.replace(eng, power_iters_resume=pr))
    timeit("fused nmf50 warm_plain=1", NMFConfig(nmf_iter=50),
           dataclasses.replace(eng, power_warm_plain=1))
    timeit("fused nmf50 warm=12", NMFConfig(nmf_iter=50),
           dataclasses.replace(eng, power_iters_warm=12))
    timeit("XLA trim nmf50", NMFConfig(nmf_iter=50),
           dataclasses.replace(eng, fuse_trim=False))
    timeit("skip-BS nmf50", NMFConfig(nmf_iter=50,
                                      skip_baseline_selection=True), eng)


if __name__ == "__main__":
    main()
