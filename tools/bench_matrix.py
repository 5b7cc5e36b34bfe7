"""Benchmark matrix in ONE process (device sessions are expensive here):
{dense, sparse degradation} x {exact, trim_fast}, 20,480 genes x 8 samples.

Prints one JSON line per config to stdout (stderr carries progress).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import json
import time

import numpy as np

N, P, NMF_ITER, ITERS = 20480, 8, 50, 5


def main():
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synth_dataset
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.engine import DegNormEngine

    datasets = {
        prof: synth_dataset(N, P, profile=prof)
        for prof in ("dense", "sparse")
    }
    nmf_cfg = NMFConfig(nmf_iter=NMF_ITER, degnorm_iter=ITERS)
    warm_cfg = dataclasses.replace(nmf_cfg, degnorm_iter=2)

    for prof in ("dense", "sparse"):
        cov, X = datasets[prof]
        for fast in (False, True):
            eng_cfg = EngineConfig(bucket_widths=(1024, 4096),
                                   trim_fast=fast)
            t0 = time.perf_counter()
            DegNormEngine(warm_cfg, eng_cfg).run(cov, X)   # compile warmup
            warm_s = time.perf_counter() - t0
            eng = DegNormEngine(nmf_cfg, eng_cfg)
            t0 = time.perf_counter()
            eng.run(cov, X)
            dt = time.perf_counter() - t0
            steady = np.median([v for k, v in eng.timings.items()
                                if k.startswith("iter_") and k != "iter_0"])
            print(f"[matrix] {prof}/{'fast' if fast else 'exact'}: "
                  f"warmup {warm_s:.0f}s wall {dt:.1f}s "
                  f"steady {steady:.2f}s/iter", file=sys.stderr, flush=True)
            print(json.dumps({
                "metric": f"nmfoa_{prof}_{'fast' if fast else 'exact'}",
                "value": round(N * ITERS / dt, 2),
                "unit": f"gene-iter/s (wall {dt:.1f}s, "
                        f"steady {steady:.2f}s/iter)",
            }), flush=True)


if __name__ == "__main__":
    main()
