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
