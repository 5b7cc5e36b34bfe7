"""Compile-and-run check of the Pallas kernels at the block sizes the new
VMEM model picks — small G so it's quick; shapes cover p=8 (flagship) and
p=32 (config-5) widths."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

def main():
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.engine import _bucket_init, _bucket_step
    from degnorm_tpu.ops.pallas_nmf import pick_block_genes
    from degnorm_tpu.ops.pallas_trim import pick_block_genes_trim

    eng_cfg = EngineConfig()
    for (G, p, W) in [(64, 32, 1024), (128, 8, 1024), (64, 8, 4096),
                      (64, 16, 1024)]:
        print(f"shape ({G},{p},{W}): bg_nmf={pick_block_genes(G,p,W)} "
              f"bg_trim={pick_block_genes_trim(G,p,W)}", flush=True)
        rng = np.random.default_rng(0)
        F = jnp.asarray(np.abs(rng.standard_normal((G, p, W))
                               ).astype(np.float32) * 20)
        mask = jnp.asarray(np.arange(W)[None, :]
                           < rng.integers(W // 2, W + 1, G)[:, None])
        sf = jnp.ones(p, jnp.float32)
        ds = jnp.zeros(G, jnp.int32)
        cfg = NMFConfig(nmf_iter=50).kernel_key()
        t = time.time()
        cs, _ = _bucket_init(F, mask, eng_cfg)
        np.asarray(cs)
        res = _bucket_step(F, mask, sf, ds, cfg, eng_cfg,
                           with_estimates=False)
        rho = np.asarray(res.rho)
        res = _bucket_step(F, mask, sf, ds, cfg, eng_cfg,
                           with_estimates=True)
        np.asarray(res.rho)
        assert np.isfinite(rho).all()
        print(f"  ok in {time.time()-t:.0f}s", flush=True)
    print("vmem_check done")


if __name__ == "__main__":
    main()
