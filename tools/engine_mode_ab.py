"""Engine-level A/B of Pallas kernel modes: full DegNorm fits on the bench
workload, comparing DI scores and steady-iteration time across gram/power
configurations (one process, shared device session).

Usage: python tools/engine_mode_ab.py [n_genes]
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

results = {}
for name, gram, wp in [("vpu_sq", "vpu", 0),
                       ("mxu_bf16_sq", "mxu_bf16", 0),
                       ("mxu_bf16_wp4", "mxu_bf16", 4),
                       ("packed_wp4", "packed_slice", 4)]:
    eng_cfg = dataclasses.replace(base_eng, gram_mode=gram,
                                  power_warm_plain=wp)
    eng = DegNormEngine(nmf_cfg, eng_cfg)
    res = eng.run(cov, X)          # first run warms compiles for this cfg
    eng = DegNormEngine(nmf_cfg, eng_cfg)
    t0 = time.perf_counter()
    res = eng.run(cov, X)
    dt = time.perf_counter() - t0
    iters = {k: v for k, v in eng.timings.items() if k.startswith("iter_")}
    steady = min(v for k, v in iters.items() if k != "iter_0") \
        if len(iters) > 1 else max(iters.values())
    results[name] = (np.asarray(res.rho), dt, steady)
    print(f"{name:>14s}: fit {dt:5.1f}s  steady-iter {steady:5.2f}s",
          flush=True)

rho0 = results["vpu_sq"][0]
for name, (rho, _, _) in results.items():
    if name == "vpu_sq":
        continue
    d = np.abs(rho - rho0)
    print(f"{name:>14s} vs vpu_sq: DI maxabs {d.max():.2e} "
          f"mean {d.mean():.2e}", flush=True)
