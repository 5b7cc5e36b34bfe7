"""A/B the real fused NMF kernel: gram modes x warm-power schemes, at
production shapes/iteration counts.  Jit-wrapped (like the engine's
_bucket_step) and dependency-chained so the tunneled runtime cannot
overlap or skip work.

Modes: vpu / mxu / mxu_bf16 (row-reduction vs gene-packed MXU grams) and
packed_slice (MXU gram + MXU v-contraction — X materializes only as the
bf16 row panel).  wp>0 swaps the squared warm-power preamble for wp plain
warm-restart matvecs (ops/pallas_nmf.py::_power_warm).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from degnorm_tpu.ops.pallas_nmf import nmf_masked_pallas

G, P, W, NMF_ITER = 2048, 8, 1024, 50
POWER_COLD, POWER_WARM = 128, 24       # EngineConfig defaults
REPS = 10
rng = np.random.default_rng(0)
t = np.linspace(0, 1, W)
base = np.abs(np.sin(np.pi*t) + 0.2)[None, None, :]
F = jnp.asarray((base * (0.5 + rng.random((G, P, 1))) * 40).astype(np.float32))
lengths = rng.integers(W//2, W+1, G)
mask = jnp.asarray(np.arange(W)[None, :] < lengths[:, None])
np.asarray(F)

def run(mode, wp=0):
    @jax.jit
    def step(f):
        K, E, u = nmf_masked_pallas(f, mask, nmf_iter=NMF_ITER,
                                    power_iters_cold=POWER_COLD,
                                    power_iters_warm=POWER_WARM,
                                    gram_mode=mode, power_warm_plain=wp)
        return K, E, f + K[0, 0] * 1e-30
    K, E, f = step(F)
    np.asarray(K)   # compile + warm
    t0 = time.perf_counter()
    f = F
    for _ in range(REPS):
        K, E, f = step(f)
    np.asarray(K)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{mode:>14s} wp={wp:<2d}: {dt*1e3:5.1f} ms/call  "
          f"({G/dt:.0f} genes/s)", flush=True)
    return np.asarray(K), np.asarray(E)

COMBOS = [("vpu", 0), ("mxu", 0), ("mxu_bf16", 0), ("packed_slice", 0),
          ("mxu_bf16", 4), ("packed_slice", 4), ("packed_slice", 8),
          ("packed_slice", 2)]
# argv override: `python tools/nmf_gram_ab.py packed_slice:2 packed_bigv:2`
if len(sys.argv) > 1:
    COMBOS = [(a.split(":")[0], int(a.split(":")[1]) if ":" in a else 0)
              for a in sys.argv[1:]]
ref = None
for mode, wp in COMBOS:
    try:
        K2, E2 = run(mode, wp)
    except Exception as e:
        print(f"{mode} wp={wp}: FAILED {str(e)[:160]}", flush=True)
        continue
    if ref is None:
        ref = (K2, E2)
        ref_name = f"{mode} wp={wp}"
        continue
    Kv, Ev = ref
    relK = np.abs(K2-Kv)/(np.abs(Kv)+1e-6)
    relE = np.abs(E2-Ev)/(np.abs(Ev)+1e-3)
    print(f"   vs {ref_name}: K maxrel {relK.max():.2e}  "
          f"E maxrel {relE.max():.2e}", flush=True)
