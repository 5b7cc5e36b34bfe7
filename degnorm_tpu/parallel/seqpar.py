"""Sequence-parallel (column-sharded) placement for outlier-length genes.

The reference cannot handle very long genes on one worker: it *shrinks*
the length axis by systematic downsampling and hard-caps genes at 9 Mb
(SURVEY.md §5.7; reference nmf.py:408-453, __main_mpi__.py:374).  Here the
position axis is treated like a sequence axis and sharded across devices
(engine.py routes buckets wider than ``EngineConfig.seqpar_width`` through
``shard_columns``), and the baseline-selection kernel runs on the plain
XLA path, which GSPMD partitions transparently.

Why there is no hand-written collective kernel here: every reduction the
algorithm needs — row sums, column maxes, per-bin sums, and the rank-1
power iteration's p x p Gram — is column-partitionable with exactly one
all-reduce, and GSPMD's lowering of the engine's actual column-sharded
bucket step was verified to achieve that (tools/seqpar_collectives.py on
an 8-device mesh: all-reduce sites only at the reduction points, one
all-gather, zero full-size (G, p, W) buffers — the feared replication of
the one bucket that was sharded precisely because it is huge does not
occur).  A dedicated one-psum-per-rank-1 shard_map kernel existed through
round 2; it duplicated what GSPMD already emits while lacking the trim
loop's warm-start (u0) and gene-skipping integration, so it was removed
rather than wired (engine parity evidence: tests/test_seqpar.py's
engine-level f64-exact test).

This is the context-parallel analog of ring attention for DegNorm's
workload: communication is O(p²) per rank-1 regardless of gene length.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_columns(x: jnp.ndarray, mesh: Mesh, axis: str = "genes"):
    """Place an array with its LAST dim sharded across the mesh."""
    spec = P(*([None] * (x.ndim - 1) + [axis]))
    return jax.device_put(x, NamedSharding(mesh, spec))
