"""Test harness config.

Tests run JAX on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path). This must happen before `jax` is imported anywhere.
"""
import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Enable float64 so parity tests can run the device kernels at oracle
# precision on CPU (production TPU path is float32).
os.environ.setdefault("JAX_ENABLE_X64", "1")

# This image's sitecustomize registers the remote "axon" TPU backend and
# pins jax to it regardless of JAX_PLATFORMS; override it explicitly so
# the test suite runs on the local 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


REFERENCE_ROOT = "/root/reference"


def load_reference_nmf():
    """Import the reference implementation (read-only) for parity tests.

    The reference's utils module imports pkg_resources, which this
    environment lacks; stub it out. Returns the GeneNMFOA class or None if
    the reference tree is unavailable.
    """
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "degnorm")):
        return None
    if "pkg_resources" not in sys.modules:
        stub = types.ModuleType("pkg_resources")
        stub.resource_filename = lambda *a, **k: "/dev/null"
        sys.modules["pkg_resources"] = stub
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from degnorm.nmf import GeneNMFOA  # noqa
    return GeneNMFOA


@pytest.fixture(scope="session")
def reference_nmfoa():
    cls = load_reference_nmf()
    if cls is None:
        pytest.skip("reference implementation not available")
    return cls


def random_coverage(rng, p, L, scale=10.0, degraded=False):
    """Synthesize a plausible coverage matrix: smooth positive envelope with
    sample-specific degradation ramps (mimics RNA-seq 3' bias)."""
    t = np.linspace(0, 1, L)
    base = scale * (0.25 + np.abs(np.sin(np.pi * t) + 0.3 * rng.standard_normal(L) * 0.05))
    rows = []
    for j in range(p):
        amp = 0.5 + rng.random() * 1.5
        row = amp * base
        if degraded and j % 2 == 1:
            # exponential decay toward the 5' end for odd samples
            row = row * np.exp(-2.0 * (1 - t) * rng.random())
        rows.append(row)
    F = np.maximum(np.vstack(rows), 0.0)
    return np.round(F, 3)
