"""Engine-level A/B of bf16 Lagrange-multiplier storage (EngineConfig.
lam_dtype): full DegNorm fits at p=16 and p=32 samples comparing
steady-iteration time and DI drift for f32 vs bf16 lambda scratch (one
process, shared device session).  At p=8 the bf16 sublane tile pads back to
the f32 footprint, so "auto" only engages at p >= 16.

Usage: python tools/lam_ab.py [n_genes]
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

nmf_cfg = NMFConfig(nmf_iter=50, degnorm_iter=3)
base_eng = EngineConfig(bucket_widths=(1024, 4096))

import jax.numpy as jnp
np.asarray(jnp.zeros(8) + 1)   # absorb device-session acquisition

for p in (16, 32):
    n = N if p == 16 else max(N // 2, 512)
    cov, X = bench.synth_dataset(n, p)
    results = {}
    for name, lam in [("f32", "f32"), ("bf16", "bf16")]:
        eng_cfg = dataclasses.replace(base_eng, lam_dtype=lam)
        eng = DegNormEngine(nmf_cfg, eng_cfg)
        res = eng.run(cov, X)          # warm compiles for this cfg
        eng = DegNormEngine(nmf_cfg, eng_cfg)
        t0 = time.perf_counter()
        res = eng.run(cov, X)
        dt = time.perf_counter() - t0
        iters = {k: v for k, v in eng.timings.items()
                 if k.startswith("iter_")}
        steady = min(v for k, v in iters.items() if k != "iter_0") \
            if len(iters) > 1 else max(iters.values())
        results[name] = (np.asarray(res.rho), dt, steady)
        print(f"p={p:2d} {name:>5s}: fit {dt:5.1f}s  "
              f"steady-iter {steady:5.2f}s", flush=True)
    d = np.abs(results["bf16"][0] - results["f32"][0])
    print(f"p={p:2d} bf16 DI drift vs f32: max {d.max():.2e} "
          f"mean {d.mean():.2e}", flush=True)
