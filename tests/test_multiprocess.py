"""Two-process jax.distributed smoke test — the degnorm_mpi replacement
running as two real OS processes on CPU (the reference tests its MPI path
the same way: 2 ranks on one machine, SURVEY.md §4)."""
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from degnorm_tpu.parallel.distributed import initialize_multihost, global_mesh
initialize_multihost()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = global_mesh()

# gene-sharded global reduction across both processes (the outer-loop
# column-sum pattern): every process contributes its shard, psum crosses
# process boundaries.
n, p = 8, 3
x = np.arange(n * p, dtype=np.float32).reshape(n, p)
xs = jax.make_array_from_callback(
    (n, p), NamedSharding(mesh, P("genes", None)),
    lambda idx: x[idx])
col = jax.jit(lambda a: jnp.sum(a, axis=0),
              out_shardings=NamedSharding(mesh, P()))(xs)
np.testing.assert_allclose(np.asarray(col), x.sum(axis=0))
print(f"proc {{jax.process_index()}} OK", flush=True)
"""


def test_two_process_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    env = dict(os.environ,
               DEGNORM_TPU_COORDINATOR="localhost:19731",
               DEGNORM_TPU_NUM_PROCESSES="2")
    procs = []
    for pid in range(2):
        e = dict(env, DEGNORM_TPU_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=100)
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert "OK" in out


_ENGINE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_ENABLE_X64"] = "1"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from degnorm_tpu.parallel.distributed import initialize_multihost, global_mesh
initialize_multihost()

import numpy as np
from collections import OrderedDict
from degnorm_tpu.config import EngineConfig, NMFConfig
from degnorm_tpu.engine import DegNormEngine

rng = np.random.default_rng(91)
cov = OrderedDict()
for i in range(8):
    L = int(120 + 40 * i)
    t = np.linspace(0, 1, L)
    base = (np.abs(np.sin(np.pi * t)) + 0.2) * (3 + i)
    cov[f"g{{i}}"] = np.round(np.vstack([base * (0.5 + 0.3 * j)
                                         for j in range(3)]), 3)
X = np.round(np.abs(rng.standard_normal((8, 3))) * 200 + 20)

eng = DegNormEngine(
    NMFConfig(nmf_iter=5, degnorm_iter=2),
    EngineConfig(rank1_method="power", dtype="float64",
                 bucket_widths=(512,)),
    mesh=global_mesh())
res = eng.run(cov, X)
np.save({out!r} + f"/rho_{{jax.process_index()}}.npy", res.rho)
print("ENGINE OK", flush=True)
"""


def test_two_process_engine(tmp_path):
    """Full DegNormEngine fit with the gene mesh spanning two OS processes
    (device-resident outer loop) — results must match a single-process
    float64 run exactly."""
    import numpy as np
    from collections import OrderedDict
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.engine import DegNormEngine

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "engine_worker.py"
    script.write_text(_ENGINE_WORKER.format(repo=repo, out=str(tmp_path)))
    env = dict(os.environ,
               DEGNORM_TPU_COORDINATOR="localhost:19741",
               DEGNORM_TPU_NUM_PROCESSES="2")
    procs = []
    for pid in range(2):
        e = dict(env, DEGNORM_TPU_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for pid, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=180)
        assert pr.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "ENGINE OK" in out

    # single-process reference run with identical data
    rng = np.random.default_rng(91)
    cov = OrderedDict()
    for i in range(8):
        L = int(120 + 40 * i)
        t = np.linspace(0, 1, L)
        base = (np.abs(np.sin(np.pi * t)) + 0.2) * (3 + i)
        cov[f"g{i}"] = np.round(np.vstack([base * (0.5 + 0.3 * j)
                                           for j in range(3)]), 3)
    X = np.round(np.abs(rng.standard_normal((8, 3))) * 200 + 20)
    single = DegNormEngine(
        NMFConfig(nmf_iter=5, degnorm_iter=2),
        EngineConfig(rank1_method="power", dtype="float64",
                     bucket_widths=(512,))).run(cov, X)

    for pid in range(2):
        rho = np.load(tmp_path / f"rho_{pid}.npy")
        np.testing.assert_allclose(rho, single.rho, rtol=1e-10)
