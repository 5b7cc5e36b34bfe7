"""Capture a jax.profiler trace of the steady DegNorm iterations on the
bench workload and print the top device ops by self time.

Usage: python tools/profile_capture.py [n_genes] [n_samples]

Writes the raw trace under /tmp/dn_trace_<N>x<P> (TensorBoard-compatible)
and summarizes it with tensorboard_plugin_profile's converters.  If the
relayed backend exports no device plane, falls back to listing the host
plane so the capture is still inspectable.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from degnorm_tpu.config import EngineConfig, NMFConfig
from degnorm_tpu.engine import DegNormEngine

trace_dir = f"/tmp/dn_trace_{N}x{P}"
cov, X = bench.synth_dataset(N, P)
nmf_cfg = NMFConfig(nmf_iter=50, degnorm_iter=3)
eng_cfg = EngineConfig(bucket_widths=(1024, 4096))

import jax.numpy as jnp
np.asarray(jnp.zeros(8) + 1)   # absorb device-session acquisition

# warm all compiles outside the trace
DegNormEngine(nmf_cfg, eng_cfg).run(cov, X)

import dataclasses
eng = DegNormEngine(nmf_cfg,
                    dataclasses.replace(eng_cfg, profile_dir=trace_dir))
t0 = time.perf_counter()
eng.run(cov, X)
print(f"traced fit: {time.perf_counter()-t0:.1f}s "
      f"timings={ {k: round(v, 2) for k, v in eng.timings.items()} }",
      flush=True)

planes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                   recursive=True)
print(f"xplane files: {planes}", flush=True)
if planes:
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                planes, tool, {})
            out = os.path.join(trace_dir, f"{tool}.out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"{tool}: wrote {out} "
                  f"({len(data)} bytes)", flush=True)
        except Exception as e:   # tool coverage varies by backend
            print(f"{tool}: FAILED ({type(e).__name__}: {e})", flush=True)
