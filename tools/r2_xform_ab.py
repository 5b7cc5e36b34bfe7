"""A/B: X-state refactor of the fused NMF Lagrangian loop (timing only).

The production loop stores the multipliers lam and rebuilds X = A0 + lam
every iteration (~7 block-sized VPU ops).  Algebraically the same map is

    X <- max(X - step*(K (x) E) + step*A0, A0)        (X0 = A0)

which needs ~5 VPU ops when C = step*A0 is precomputed (one extra VMEM
block, so smaller gene blocks) or ~6 without.  Variants:

  v0_lam      production form (lam scratch, X rebuilt per iteration)
  v1_x        X-form, step*(KE - A0) per iteration (no extra buffer)
  v2_xc       X-form + precomputed C = step*A0 (extra VMEM block)
  v3_xc_bf16  v2 with X stored bf16 (no per-iteration cast; Gram reads X)

Numerics: v1/v2 are f32-reassociation-class vs v0; v3 adds bf16 X storage
(lam_dtype-like class).  This tool times only; drift is measured separately
before any production switch.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np

REPS = 10
NMF_ITER = 50
P, W, G = 8, 1024, 2048


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/degnorm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from degnorm_tpu.ops.pallas_nmf import (_VMEM_BUDGET, _rank1,
                                            _refine_E_f32)

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8) + 1)
    print(f"[ab] device session: {time.perf_counter() - t0:.1f}s", flush=True)

    GRAM = "packed_slice"
    WARM_PLAIN = 4
    POWER_COLD, POWER_WARM = 128, 24

    def make_kernel(variant, n_scratch_blocks):
        def kernel(a0_ref, k_ref, e_ref, *scratch):
            A0 = a0_ref[:]
            BG, p, Wb = A0.shape
            u0 = jnp.full((BG, p), 1.0 / (p ** 0.5), A0.dtype)
            K, E, u = _rank1(A0, u0, POWER_COLD, GRAM)
            step = 1.0 / (NMF_ITER ** 0.5)
            s_ref = scratch[0]

            if variant == "v0_lam":
                s_ref[:] = jnp.zeros(s_ref.shape, s_ref.dtype)

                def body(_, carry):
                    K, E, u = carry
                    est = K[:, :, None] * E[:, None, :]
                    lam = jnp.maximum(s_ref[:] - step * (est - A0), 0.0)
                    s_ref[:] = lam
                    return _rank1(A0 + lam, u, POWER_WARM, GRAM,
                                  warm_plain=WARM_PLAIN)
            elif variant == "v1_x":
                s_ref[:] = A0

                def body(_, carry):
                    K, E, u = carry
                    est = K[:, :, None] * E[:, None, :]
                    X = jnp.maximum(s_ref[:] - step * (est - A0), A0)
                    s_ref[:] = X
                    return _rank1(X, u, POWER_WARM, GRAM,
                                  warm_plain=WARM_PLAIN)
            elif variant in ("v2_xc", "v3_xc_bf16"):
                c_ref = scratch[1]
                c_ref[:] = step * A0
                s_ref[:] = A0.astype(s_ref.dtype)

                def body(_, carry):
                    K, E, u = carry
                    Ks = step * K
                    est_s = Ks[:, :, None] * E[:, None, :]
                    X = jnp.maximum(
                        s_ref[:].astype(A0.dtype) - est_s + c_ref[:], A0)
                    s_ref[:] = X.astype(s_ref.dtype)
                    return _rank1(X, u, POWER_WARM, GRAM,
                                  warm_plain=WARM_PLAIN)

            K, E, u = jax.lax.fori_loop(0, NMF_ITER, body, (K, E, u))
            if GRAM == "packed_slice":
                E = _refine_E_f32(s_ref[:].astype(A0.dtype)
                                  if variant != "v0_lam"
                                  else A0 + s_ref[:], K, u)
            k_ref[:] = K
            e_ref[:] = E
        return kernel

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, W)
    base = np.abs(np.sin(np.pi * t) + 0.2)[None, None, :]

    def run(variant):
        # VMEM model: v0/v1 = 7 blocks (production), v2 = 8 (extra C),
        # v3 = 7.5 (C f32 + X bf16)
        blocks = {"v0_lam": 7, "v1_x": 7, "v2_xc": 8, "v3_xc_bf16": 7.5}[
            variant]
        per_gene = int(blocks * P * W * 4)
        bg = max(8, int(_VMEM_BUDGET // per_gene) // 8 * 8)
        G_pad = ((G + bg - 1) // bg) * bg
        F = jnp.asarray((base * (0.5 + rng.random((G_pad, P, 1))) * 40
                         ).astype(np.float32))
        scratch = [pltpu.VMEM((bg, P, W),
                              jnp.bfloat16 if variant == "v3_xc_bf16"
                              else jnp.float32)]
        if variant in ("v2_xc", "v3_xc_bf16"):
            scratch.append(pltpu.VMEM((bg, P, W), jnp.float32))

        call = pl.pallas_call(
            make_kernel(variant, len(scratch)),
            grid=(G_pad // bg,),
            in_specs=[pl.BlockSpec((bg, P, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((bg, P), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((G_pad, P), jnp.float32),
                jax.ShapeDtypeStruct((G_pad, W), jnp.float32),
            ),
            scratch_shapes=scratch,
        )

        @jax.jit
        def step(f):
            K, E = call(f)
            return K, E, f + K[0, 0] * 1e-30

        K, E, f = step(F)
        K0 = np.asarray(K)
        t0 = time.perf_counter()
        f = F
        for _ in range(REPS):
            K, E, f = step(f)
        np.asarray(K)
        dt = (time.perf_counter() - t0) / REPS
        print(f"[ab] {variant:>12s}: {dt*1e3:6.2f} ms/call (bg={bg})",
              flush=True)
        return dt, K0

    dt0, K0 = run("v0_lam")
    for v in ("v1_x", "v2_xc", "v3_xc_bf16"):
        dt, Kv = run(v)
        rel = np.max(np.abs(Kv - K0) / (np.abs(K0) + 1e-12))
        print(f"[ab]   -> {v}: {dt0/dt:.3f}x vs v0, K maxrel {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
