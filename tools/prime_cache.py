"""Precompile engine kernels for given bucket shapes into the persistent
JAX compilation cache.

Remote TPU compiles of the fused trim kernel take minutes; priming them
one shape per process keeps each run inside scheduler timeouts and makes
subsequent engine/bench runs near-instant.

Usage:
    python tools/prime_cache.py G,p,W [G,p,W ...] [--nmf-iter N]
    python tools/prime_cache.py --bench-shapes [--genes N] [--samples P]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_shapes(n_genes, p, widths=(1024, 4096)):
    """Predict bench.py's kernel shapes from its OWN length distribution
    (one quantized batch per width at current engine defaults).  Defaults
    match bench.py's defaults (BENCH_GENES=20480) so the documented
    `--bench-shapes` invocation primes exactly the shapes bench needs."""
    from degnorm_tpu.data.buckets import _quantize_count
    from bench import synth_lengths    # single source of the distribution
    lengths = synth_lengths(n_genes)
    shapes = []
    for w in widths:
        lo = 0 if w == min(widths) else max(x for x in widths if x < w)
        cnt = int(((lengths > lo) & (lengths <= w)).sum())
        if cnt:
            shapes.append((_quantize_count(cnt), p, w))
    return sorted(set(shapes))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shapes", nargs="*", help="G,p,W triples")
    ap.add_argument("--bench-shapes", action="store_true")
    ap.add_argument("--genes", type=int,
                    default=int(os.environ.get("BENCH_GENES", 20480)))
    ap.add_argument("--samples", type=int,
                    default=int(os.environ.get("BENCH_SAMPLES", 8)))
    ap.add_argument("--nmf-iter", type=int,
                    default=int(os.environ.get("BENCH_NMF_ITER", 50)))
    ap.add_argument("--max-shapes", type=int, default=1,
                    help="compile at most this many uncached shapes")
    args = ap.parse_args()

    import jax
    from degnorm_tpu.engine import default_cache_dir
    cache_dir = default_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import jax.numpy as jnp
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.engine import _bucket_init, _bucket_step

    shapes = [tuple(int(x) for x in s.split(",")) for s in args.shapes]
    if args.bench_shapes:
        shapes += bench_shapes(args.genes, args.samples)
    nmf_cfg = NMFConfig(nmf_iter=args.nmf_iter).kernel_key()
    eng_cfg = EngineConfig()

    done = 0
    for (G, p, W) in shapes:
        rng = np.random.default_rng(0)
        F = jnp.asarray(
            np.abs(rng.standard_normal((G, p, W))).astype(np.float32))
        mask = jnp.asarray(
            np.arange(W)[None, :] < rng.integers(W // 2, W + 1, G)[:, None])
        sf = jnp.ones(p, jnp.float32)
        ds = jnp.zeros(G, jnp.int32)
        t = time.time()
        cs, es = _bucket_init(F, mask, eng_cfg)
        np.asarray(cs)
        t_init = time.time() - t
        t = time.time()
        # both kernel variants: intermediate iterations (no estimate
        # factors) and the final iteration (with them)
        res = _bucket_step(F, mask, sf, ds, nmf_cfg, eng_cfg,
                           with_estimates=False)
        np.asarray(res.rho)
        res = _bucket_step(F, mask, sf, ds, nmf_cfg, eng_cfg,
                           with_estimates=True)
        np.asarray(res.rho)
        t_step = time.time() - t
        print(f"shape ({G},{p},{W}): init {t_init:.1f}s step {t_step:.1f}s",
              flush=True)
        if t_step > 30:
            done += 1
            if done >= args.max_shapes:
                print("fresh-compile budget reached; run again for more")
                break
    print("prime_cache done")


if __name__ == "__main__":
    main()
