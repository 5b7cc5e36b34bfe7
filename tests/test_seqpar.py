"""Sequence-parallel (column-sharded) NMF parity on the 8-device mesh."""
import numpy as np
import jax.numpy as jnp

from degnorm_tpu.core.nmf import nmf_masked
from degnorm_tpu.parallel.seqpar import nmf_masked_seqparallel, shard_columns
from degnorm_tpu.parallel.sharded import make_mesh
from tests.conftest import random_coverage
from tests.test_core_parity import make_bucket


def test_seqparallel_nmf_matches_single_device():
    rng = np.random.default_rng(55)
    mats = [random_coverage(rng, 3, L, degraded=True) for L in (1000, 2048)]
    F, mask = make_bucket(mats, 2048)   # W = 2048 = 8 * 256

    kw = dict(nmf_iter=8, power_iters_cold=60, power_iters_warm=10)
    K1, E1, _ = nmf_masked(F, mask, **kw)

    mesh = make_mesh()
    F_s = shard_columns(jnp.asarray(F), mesh)
    m_s = shard_columns(jnp.asarray(mask), mesh)
    K2, E2, _ = nmf_masked_seqparallel(F_s, m_s, mesh, **kw)

    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-9, atol=1e-12)
