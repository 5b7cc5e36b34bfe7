"""Validate the re-probed p-dependent VMEM block model
(pallas_nmf._nmf_blocks / _trim_blocks) across shapes on real hardware:
every shape must
compile (Mosaic rejects over-budget kernels at compile time) and the
fused trim path must agree with the XLA trim twin within the production
DI tolerance.  Includes the boundary shape W=8192 p=8 that the new
multiplier newly admits to the fused path.

Usage: python tools/r2_block_validate.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np

REPS = 3


def synth(G, P, W, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, W)[None, None, :]
    base = np.abs(np.sin(np.pi * t) + 0.2)
    amp = 0.5 + rng.random((G, P, 1)) * 1.5
    dec = np.exp(-2.0 * (1 - t) * rng.random((G, P, 1)))
    odd = (np.arange(P) % 2 == 1)[None, :, None]
    m = amp * 8 * base * np.where(odd, dec, 1.0)
    return np.round(np.maximum(m, 0) * 20).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.core.baseline import baseline_select_bucket
    from degnorm_tpu.ops import pallas_nmf, pallas_trim

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[val] device session: {time.perf_counter() - t0:.1f}s",
          flush=True)

    cfg = NMFConfig(nmf_iter=50)
    SHAPES = [
        (2048, 8, 1024),
        (512, 8, 4096),
        (1024, 16, 1024),
        (512, 32, 512),
        (64, 8, 8192),    # newly admitted boundary: bg=8 at 13 MiB exactly
        (2048, 8, 1024),  # repeat of shape 1: relay-warm timing
    ]
    failures = 0
    for (G, P, W) in SHAPES:
        F = jnp.asarray(synth(G, P, W))
        mask = jnp.ones((G, W), bool)
        bg_t = pallas_trim.pick_block_genes_trim(G, P, W)
        bg_n = pallas_nmf.pick_block_genes(G, P, W)
        sup = pallas_trim.fused_trim_supported((G, P, W), jnp.float32)
        label = f"G={G} p={P} W={W} bg_nmf={bg_n} bg_trim={bg_t} fused={sup}"

        def run(fuse):
            eng = EngineConfig(fuse_trim=fuse)

            @jax.jit
            def step(f):
                r = baseline_select_bucket(f, mask, cfg, eng,
                                           with_estimates=False)
                return r.rho, f + r.rho[0, 0] * 1e-30

            rho, f = step(F)
            rho0 = np.asarray(rho)
            t0 = time.perf_counter()
            for _ in range(REPS):
                rho, f = step(f)
            np.asarray(f[0, 0, 0])
            return rho0, (time.perf_counter() - t0) / REPS

        try:
            rho_f, dt_f = run(True)
        except Exception as e:
            print(f"[val] {label}: FUSED FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            failures += 1
            continue
        rho_x, dt_x = run(False)
        d = np.abs(rho_f - rho_x).max()
        ok = d < 5e-3
        failures += 0 if ok else 1
        print(f"[val] {label}: fused {dt_f*1e3:7.1f} ms  "
              f"xla {dt_x*1e3:7.1f} ms  DI maxabs {d:.2e} "
              f"{'OK' if ok else 'DRIFT FAIL'}", flush=True)
    print(f"[val] failures: {failures}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
