"""Round-2 measurement batch (single TPU process, experiments sequential).

Answers, with one device-session cost:
  1. host-loop vs device-resident outer loop on a single chip (bench shape)
  2. where the ~1.5 s "init" phase goes (dispatch vs transfer vs presort)
  3. kernel-level NMF cost at bench shapes (dependency-chained timing)

Usage: python tools/r2_probe.py [probe...]   (default: all)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np

PROBES = set(sys.argv[1:]) or {"engine", "init", "kernel"}


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import synth_dataset
    from degnorm_tpu.config import EngineConfig, NMFConfig
    from degnorm_tpu.engine import DegNormEngine, _bucket_init

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[probe] device session: {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    cov, X = synth_dataset(20480, 8)
    print(f"[probe] synth: {time.perf_counter() - t0:.1f}s", flush=True)

    nmf_cfg = NMFConfig(nmf_iter=50, degnorm_iter=5)
    eng_cfg = EngineConfig(bucket_widths=(1024, 4096))

    if "engine" in PROBES:
        # warmup (compiles both kernel variants)
        t0 = time.perf_counter()
        DegNormEngine(dataclasses.replace(nmf_cfg, degnorm_iter=2),
                      eng_cfg).run(cov, X)
        print(f"[probe] warmup: {time.perf_counter() - t0:.1f}s", flush=True)

        for label, cfg in (
                ("host-loop", eng_cfg),
                ("device-loop", dataclasses.replace(eng_cfg, device_loop=True)),
                ("host-loop(2)", eng_cfg),
                ("device-loop(2)", dataclasses.replace(eng_cfg,
                                                       device_loop=True)),
        ):
            engine = DegNormEngine(nmf_cfg, cfg)
            t0 = time.perf_counter()
            engine.run(cov, X)
            dt = time.perf_counter() - t0
            print(f"[probe] {label}: {dt:.2f}s  "
                  f"{ {k: round(v, 3) for k, v in engine.timings.items()} }",
                  flush=True)

    if "init" in PROBES:
        # ---- init breakdown on a fresh engine ----
        engine = DegNormEngine(nmf_cfg, eng_cfg)
        engine.timings = {}
        cov_mats = [np.asarray(v) for v in cov.values()]
        engine._n_genes = len(cov_mats)
        t0 = time.perf_counter()
        engine._pack(cov_mats)
        print(f"[probe] init.pack: {time.perf_counter() - t0:.2f}s "
              f"({ {k: round(v, 3) for k, v in engine.timings.items()} })",
              flush=True)
        n, p = X.shape
        t0 = time.perf_counter()
        init_out = [_bucket_init(F_d, m_d, eng_cfg)
                    for F_d, m_d in zip(engine._device_F,
                                        engine._device_mask)]
        print(f"[probe] init.dispatch ({len(init_out)} buckets): "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
        t0 = time.perf_counter()
        host_out = [(np.asarray(cs), np.asarray(es)) for cs, es in init_out]
        print(f"[probe] init.fetch: {time.perf_counter() - t0:.2f}s",
              flush=True)
        from degnorm_tpu.core import degnorm as outer
        from degnorm_tpu.data.buckets import scatter_rows
        t0 = time.perf_counter()
        cov_sums = np.zeros((n, p)); est_sums = np.zeros((n, p))
        for b, (cs, es) in zip(engine._buckets, host_out):
            scatter_rows(cov_sums, cs.astype(np.float64), b.gene_indices)
            scatter_rows(est_sums, es.astype(np.float64), b.gene_indices)
        rho_init = outer.rho_from_ratio_svd(cov_sums, est_sums)
        outer.init_state(rho_init, X.astype(np.float64))
        print(f"[probe] init.hostmath: {time.perf_counter() - t0:.3f}s",
              flush=True)
        t0 = time.perf_counter()
        engine._presort_by_init_rho(rho_init)
        print(f"[probe] init.presort-dispatch: "
              f"{time.perf_counter() - t0:.3f}s", flush=True)
        t0 = time.perf_counter()
        for F_d in engine._device_F:
            F_d.block_until_ready()
        print(f"[probe] init.presort-sync: {time.perf_counter() - t0:.3f}s",
              flush=True)

    if "kernel" in PROBES:
        # ---- kernel-level NMF timing, dependency-chained ----
        from degnorm_tpu.ops.pallas_nmf import nmf_masked_pallas
        rng = np.random.default_rng(0)
        for (G, p, W) in ((2048, 8, 1024), (2048, 8, 4096)):
            t = np.linspace(0, 1, W)
            base = np.abs(np.sin(np.pi * t) + 0.2)[None, None, :]
            F = jnp.asarray((base * (0.5 + rng.random((G, p, 1))) * 40
                             ).astype(np.float32))
            mask = jnp.ones((G, W), bool)
            for gram in ("packed_slice", "mxu_bf16", "vpu"):
                import functools

                @functools.partial(jax.jit, static_argnames=("gm",))
                def step(f, gm):
                    K, E, u = nmf_masked_pallas(
                        f, mask, nmf_iter=50, power_iters_cold=128,
                        power_iters_warm=24, gram_mode=gm,
                        power_warm_plain=4)
                    return K, f + K[0, 0] * 1e-30

                K, f = step(F, gram)
                np.asarray(K)
                REPS = 10
                t0 = time.perf_counter()
                f = F
                for _ in range(REPS):
                    K, f = step(f, gram)
                np.asarray(K)
                dt = (time.perf_counter() - t0) / REPS
                print(f"[probe] nmf50 G={G} p={p} W={W} {gram:>12s}: "
                      f"{dt*1e3:6.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
