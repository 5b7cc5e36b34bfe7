"""A/B the real fused NMF kernel: vpu vs mxu gram, production shapes.
Jit-wrapped (like the engine's _bucket_step) and dependency-chained so the
tunneled runtime cannot overlap or skip work."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import jax, jax.numpy as jnp, numpy as np
from degnorm_tpu.ops.pallas_nmf import nmf_masked_pallas

G, P, W, NMF_ITER = 2048, 8, 1024, 50
REPS = 10
rng = np.random.default_rng(0)
t = np.linspace(0, 1, W)
base = np.abs(np.sin(np.pi*t) + 0.2)[None, None, :]
F = jnp.asarray((base * (0.5 + rng.random((G, P, 1))) * 40).astype(np.float32))
lengths = rng.integers(W//2, W+1, G)
mask = jnp.asarray(np.arange(W)[None, :] < lengths[:, None])
np.asarray(F)

def run(mode):
    @jax.jit
    def step(f):
        K, E, u = nmf_masked_pallas(f, mask, nmf_iter=NMF_ITER,
                                    power_iters_cold=128, power_iters_warm=24,
                                    gram_mode=mode)
        return K, E, f + K[0, 0] * 1e-30
    K, E, f = step(F)
    np.asarray(K)   # compile + warm
    t0 = time.perf_counter()
    f = F
    for _ in range(REPS):
        K, E, f = step(f)
    np.asarray(K)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{mode}: {dt*1e3:.1f} ms/call  ({G/dt:.0f} genes/s)", flush=True)
    return np.asarray(K), np.asarray(E)

Kv, Ev = run("vpu")
Km, Em = run("mxu")
Kb, Eb = run("mxu_bf16")
for nm, (K2, E2) in (("mxu", (Km, Em)), ("mxu_bf16", (Kb, Eb))):
    relK = np.abs(K2-Kv)/(np.abs(Kv)+1e-6)
    relE = np.abs(E2-Ev)/(np.abs(Ev)+1e-3)
    print(f"{nm} vs vpu: K maxrel {relK.max():.2e}  E maxrel {relE.max():.2e}")
