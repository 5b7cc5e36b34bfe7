"""Fresh-compile probe of the max Pallas gene-block size per kernel.

The persistent compile cache can mask environment drift: a block size
"validated" yesterday may only pass today because yesterday's executable
is cached, while a fresh compile of the same program is rejected (the
remote compile helper's scoped-VMEM accounting changed between sessions
— observed 2026-08-19: trim bg=64 @ p=8 W=1024 cached-OK but
fresh-compile OOM at 17.44 MiB vs the 16 MiB limit).

This probe uses an isolated cache dir so every compile is fresh, drives
the REAL production path (baseline_select_bucket with production static
params) with the block pickers monkeypatched, and reports compile
success + the scoped-VMEM usage parsed from failures.

Usage: python tools/r2_block_probe2.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re
import shutil
import tempfile
import time

import numpy as np

SHAPES = [
    # (G, p, W, trim sizes to try, nmf sizes to try)
    (512, 8, 4096, (8, 16, 24), (16, 24)),
    (128, 8, 8192, (8,), (8,)),
    (512, 16, 1024, (32, 40), (32, 40)),
]


def synth(G, P, W, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, W)[None, None, :]
    base = np.abs(np.sin(np.pi * t) + 0.2)
    amp = 0.5 + rng.random((G, P, 1)) * 1.5
    dec = np.exp(-2.0 * (1 - t) * rng.random((G, P, 1)))
    odd = (np.arange(P) % 2 == 1)[None, :, None]
    m = amp * 8 * base * np.where(odd, dec, 1.0)
    return np.round(np.maximum(m, 0) * 20).astype(np.float32)


def main():
    cache = tempfile.mkdtemp(prefix="degnorm_probe_cache_")
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", cache)
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.core.baseline import baseline_select_bucket
    from degnorm_tpu.ops import pallas_nmf, pallas_trim

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[blk2] device session: {time.perf_counter() - t0:.1f}s",
          flush=True)

    cfg = NMFConfig(nmf_iter=50)
    eng = EngineConfig()
    orig_nmf = pallas_nmf.pick_block_genes
    orig_trim = pallas_trim.pick_block_genes_trim

    def probe(G, P, W, bg_trim, bg_nmf):
        F = jnp.asarray(synth(G, P, W))
        mask = jnp.ones((G, W), bool)
        pallas_nmf.pick_block_genes = (
            lambda G_, *a, v=bg_nmf, **kw: min(v, ((G_ + 7) // 8) * 8))
        pallas_trim.pick_block_genes_trim = (
            lambda G_, *a, v=bg_trim, **kw: min(v, ((G_ + 7) // 8) * 8))
        try:
            @jax.jit
            def step(f):
                r = baseline_select_bucket(f, mask, cfg, eng,
                                           with_estimates=False)
                return r.rho

            rho = np.asarray(step(F))
            print(f"[blk2] G={G} p={P} W={W} bg_trim={bg_trim} "
                  f"bg_nmf={bg_nmf}: OK (rho mean {rho.mean():.4f})",
                  flush=True)
            return True
        except Exception as e:
            m = re.search(r"size ([\d.]+)M and limit ([\d.]+)M", str(e))
            k = re.search(r"pallas_(trim|nmf|stream)\.py", str(e))
            det = (f"vmem {m.group(1)}M/{m.group(2)}M" if m
                   else str(e)[:120])
            if k:
                det += f" in pallas_{k.group(1)}"
            print(f"[blk2] G={G} p={P} W={W} bg_trim={bg_trim} "
                  f"bg_nmf={bg_nmf}: FAILED ({det})", flush=True)
            return False
        finally:
            pallas_nmf.pick_block_genes = orig_nmf
            pallas_trim.pick_block_genes_trim = orig_trim

    for G, P, W, trims, nmfs in SHAPES:
        # isolate: probe trim sizes at the smallest nmf size, then nmf
        # sizes at the smallest trim size
        for bt in trims:
            probe(G, P, W, bt, nmfs[0])
        for bn in nmfs[1:]:
            probe(G, P, W, trims[0], bn)
    shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
