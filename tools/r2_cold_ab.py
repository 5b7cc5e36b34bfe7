"""Engine-level A/B: power_iters_cold below the 128 default — full
DegNorm fits on the bench workload, measuring init time, steady-iteration
time, DI drift and baseline-selection decision drift vs the default.

power_iters_cold feeds two places: the one-time init rank-1 over all
genes (engine._bucket_init) and the round-0 cold start inside every
NMF/trim call (the squared-operator scheme runs power_iters_cold/4
doubled steps).  The kernel scan (tools/r2_kernel_scan.py) measured
cold=32 at 8.77 vs cold=128 at 10.91 ms/call on nmf50 — this tool asks
whether the accuracy cost is inside the accepted precision class
(tolerance-gated vs the f64 oracle, zero decision flips).

Usage: python tools/r2_cold_ab.py [n_genes]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from degnorm_tpu.config import EngineConfig, NMFConfig
from degnorm_tpu.engine import DegNormEngine

cov, X = bench.synth_dataset(N, 8)
nmf_cfg = NMFConfig(nmf_iter=50, degnorm_iter=3)
base_eng = EngineConfig(bucket_widths=(1024, 4096))

import jax.numpy as jnp
np.asarray(jnp.zeros(8) + 1)   # absorb device-session acquisition

CONFIGS = [
    ("cold128 (default)", dict()),
    ("cold96", dict(power_iters_cold=96)),
    ("cold64", dict(power_iters_cold=64)),
    ("cold48", dict(power_iters_cold=48)),
    ("cold32", dict(power_iters_cold=32)),
]

results = {}
for name, kw in CONFIGS:
    eng_cfg = dataclasses.replace(base_eng, **kw)
    eng = DegNormEngine(nmf_cfg, eng_cfg)
    eng.run(cov, X)                # warm compiles for this cfg
    eng = DegNormEngine(nmf_cfg, eng_cfg)
    t0 = time.perf_counter()
    res = eng.run(cov, X)
    dt = time.perf_counter() - t0
    iters = {k: v for k, v in eng.timings.items() if k.startswith("iter_")}
    steady = min(v for k, v in iters.items() if k != "iter_0") \
        if len(iters) > 1 else max(iters.values())
    results[name] = (np.asarray(res.rho),
                     np.asarray(res.ran_baseline_selection), dt, steady)
    print(f"{name:>20s}: fit {dt:5.1f}s  init {eng.timings['init']:5.2f}s  "
          f"steady-iter {steady:5.2f}s", flush=True)

rho0, ran0, _, _ = results["cold128 (default)"]
for name, (rho, ran, _, _) in results.items():
    if name == "cold128 (default)":
        continue
    d = np.abs(rho - rho0)
    flips = int((ran != ran0).sum())
    print(f"{name:>20s} vs default: DI maxabs {d.max():.2e} "
          f"mean {d.mean():.2e}  ran_bs flips {flips}/{ran0.size}",
          flush=True)
