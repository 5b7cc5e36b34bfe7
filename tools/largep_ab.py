"""Large-p A/B (round-5 verdict item 2): per-gene cost of the fused NMF
kernel at p=8/16/32 (equal total elements), plus candidate large-p
packings selected by argv.  One process, one device session; chained.

    python tools/largep_ab.py                 # shape sweep, packed_slice
    python tools/largep_ab.py MODE[:wp] ...   # modes at every shape
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

from degnorm_tpu.engine import default_cache_dir
try:
    jax.config.update("jax_compilation_cache_dir", default_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from degnorm_tpu.ops.pallas_nmf import nmf_masked_pallas

NMF_ITER = 50
POWER_COLD, POWER_WARM = 128, 24
REPS = int(os.environ.get("AB_REPS", 10))
SHAPES = [(2048, 8, 1024), (1024, 16, 1024), (512, 32, 1024)]
MODES = [("packed_slice", 1)]
if len(sys.argv) > 1:
    MODES = [(a.split(":")[0], int(a.split(":")[1]) if ":" in a else 1)
             for a in sys.argv[1:]]

def make(G, P, W, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, W)
    base = np.abs(np.sin(np.pi * t) + 0.2)[None, None, :]
    F = jnp.asarray((base * (0.5 + rng.random((G, P, 1))) * 40
                     ).astype(np.float32))
    lengths = rng.integers(W // 2, W + 1, G)
    mask = jnp.asarray(np.arange(W)[None, :] < lengths[:, None])
    np.asarray(F)
    return F, mask

def run(F, mask, mode, wp):
    G = F.shape[0]
    @jax.jit
    def step(f):
        K, E, u = nmf_masked_pallas(f, mask, nmf_iter=NMF_ITER,
                                    power_iters_cold=POWER_COLD,
                                    power_iters_warm=POWER_WARM,
                                    gram_mode=mode, power_warm_plain=wp)
        return K, E, f + K[0, 0] * 1e-30
    K, E, f = step(F); np.asarray(K)     # compile + warm
    t0 = time.perf_counter()
    f = F
    for _ in range(REPS):
        K, E, f = step(f)
    np.asarray(K)
    dt = (time.perf_counter() - t0) / REPS
    return dt, np.asarray(K), np.asarray(E)

base_pg = {}
for (G, P, W) in SHAPES:
    F, mask = make(G, P, W)
    for mode, wp in MODES:
        try:
            dt, K, E = run(F, mask, mode, wp)
        except Exception as e:
            print(f"G={G} p={P}: {mode} wp={wp} FAILED {str(e)[:140]}",
                  flush=True)
            continue
        pg = dt / G * 1e6
        key = (mode, wp)
        rel = ""
        if key in base_pg:
            rel = f"  per-gene vs p=8: {pg / base_pg[key]:.2f}x"
        else:
            base_pg[key] = pg
        print(f"G={G:5d} p={P:2d} W={W}: {mode:>13s} wp={wp} "
              f"{dt*1e3:6.1f} ms/call  {pg:6.2f} us/gene{rel}",
              flush=True)
