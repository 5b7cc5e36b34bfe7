"""Probe larger Pallas gene-block sizes than the VMEM model allows.

The X-form update removed one live block-sized value from the Lagrangian
loop, so the empirical live-buffer multipliers (_NMF_BLOCKS=7,
_TRIM_BLOCKS=8) may now be conservative.  This monkeypatches the block
pickers to larger bg and times the dense trim workload — Mosaic rejects
over-budget kernels at compile time, which the probe reports per size.

Usage: python tools/r2_block_probe.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    from degnorm_tpu.ops import pallas_nmf, pallas_trim

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[blk] device session: {time.perf_counter() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, W)[None, None, :]
    base = np.abs(np.sin(np.pi * t) + 0.2)
    amp = 0.5 + rng.random((G, P, 1)) * 1.5
    dec = np.exp(-2.0 * (1 - t) * rng.random((G, P, 1)))
    odd = (np.arange(P) % 2 == 1)[None, :, None]
    m = amp * 8 * base * np.where(odd, dec, 1.0)
    F = jnp.asarray(np.round(np.maximum(m, 0) * 20).astype(np.float32))
    mask = jnp.ones((G, W), bool)
    cfg = NMFConfig(nmf_iter=50)
    eng = EngineConfig()

    orig_nmf_pick = pallas_nmf.pick_block_genes
    orig_trim_pick = pallas_trim.pick_block_genes_trim

    def timeit(label):
        @jax.jit
        def step(f):
            r = baseline_select_bucket(f, mask, cfg, eng,
                                       with_estimates=False)
            return r.rho, f + r.rho[0, 0] * 1e-30

        rho, f = step(F)
        rho0 = np.asarray(rho)
        t0 = time.perf_counter()
        f = F
        for _ in range(REPS):
            rho, f = step(f)
        np.asarray(rho)
        dt = (time.perf_counter() - t0) / REPS
        print(f"[blk] {label:>28s}: {dt*1e3:7.1f} ms/call", flush=True)
        return dt, rho0

    _, rho_base = timeit("baseline bg_trim=48 bg_nmf=56")
    for bg_trim, bg_nmf in ((56, 64), (64, 72), (72, 80)):
        pallas_nmf.pick_block_genes = (
            lambda G, p, W, dtype_bytes=4, lam_bf16=False, v=bg_nmf:
            min(v, ((G + 7) // 8) * 8))
        pallas_trim.pick_block_genes_trim = (
            lambda G, p, W, dtype_bytes=4, lam_bf16=False, v=bg_trim:
            min(v, ((G + 7) // 8) * 8))
        try:
            dt, rho = timeit(f"bg_trim={bg_trim} bg_nmf={bg_nmf}")
            d = np.abs(rho - rho_base)
            print(f"[blk]    DI maxabs vs base {d.max():.2e}", flush=True)
        except Exception as e:
            print(f"[blk] bg_trim={bg_trim} bg_nmf={bg_nmf}: FAILED "
                  f"{str(e)[:160]}", flush=True)
        finally:
            pallas_nmf.pick_block_genes = orig_nmf_pick
            pallas_trim.pick_block_genes_trim = orig_trim_pick


if __name__ == "__main__":
    main()
