"""Generate the frozen golden-DI regression fixture by running the
REFERENCE implementation (imported read-only from /root/reference) on a
deterministic synthetic dataset.

The fixture (tests/data/golden_nmfoa.npz) pins the reference's exact
outputs — rho, adjusted counts, scale factors, ran-baseline-selection —
so the test suite can detect numeric drift in our oracle/engine without
needing the reference checkout at test time (its test BAM blobs are
already stripped; this covers the algorithm layer instead).

Usage: python tools/make_golden.py   (writes tests/data/golden_nmfoa.npz)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import types
from collections import OrderedDict

import numpy as np

N_GENES, P, NMF_ITER, DEGNORM_ITER = 24, 4, 20, 3
SEED = 20260817


def golden_dataset():
    """Deterministic mixed dataset: degraded/flat genes, varied lengths."""
    rng = np.random.default_rng(SEED)
    cov = OrderedDict()
    lengths = rng.integers(250, 1800, N_GENES)
    for i in range(N_GENES):
        L = int(lengths[i])
        t = np.linspace(0, 1, L)
        base = np.abs(np.sin(np.pi * t) + 0.2) * (3 + 10 * rng.random())
        rows = []
        for j in range(P):
            amp = 0.5 + rng.random() * 1.5
            row = amp * base
            if (i + j) % 2 == 1:
                row = row * np.exp(-2.5 * (1 - t) * rng.random())
            rows.append(np.round(np.maximum(row, 0.0) * 15))
        cov[f"g{i:03d}"] = np.vstack(rows).astype(np.float64)
    X = np.round(np.abs(rng.standard_normal((N_GENES, P))) * 250 + 40)
    return cov, X


def main():
    if "pkg_resources" not in sys.modules:
        stub = types.ModuleType("pkg_resources")
        stub.resource_filename = lambda *a, **k: "/dev/null"
        sys.modules["pkg_resources"] = stub
    sys.path.append("/root/reference")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from degnorm.nmf import GeneNMFOA

    cov, X = golden_dataset()
    o = GeneNMFOA(degnorm_iter=DEGNORM_ITER, nmf_iter=NMF_ITER, n_jobs=1)
    o.run(OrderedDict((g, F.copy()) for g, F in cov.items()), X.copy())

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "golden_nmfoa.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        rho=o.rho, x_adj=o.x_adj, scale_factors=o.scale_factors,
        ran_baseline_selection=o.ran_baseline_selection,
        x=X, seed=SEED, n_genes=N_GENES, p=P,
        nmf_iter=NMF_ITER, degnorm_iter=DEGNORM_ITER)
    print(f"wrote {out}")
    print("rho[:3]:\n", np.round(o.rho[:3], 5))


if __name__ == "__main__":
    main()
