"""W-streamed Pallas NMF kernel for blocks too wide for full VMEM residency.

The fused kernel (ops/pallas_nmf.py) keeps ~7 (bg, p, W)-sized blocks of
working set VMEM-resident (coverage, multipliers, estimate, packed panels,
temporaries), which caps p*W: at p=32 only W<=1024 fits, so wider buckets
previously fell back to the plain XLA lowering (~5 HBM materializations
per inner iteration).  This kernel keeps ONLY the Lagrangian state
VMEM-resident — one (bg, p, W) block holding X = A0 + lambda (the X-form
of the update, ops/pallas_nmf.py::_nmf_loop) — and streams the (constant)
masked coverage A0 through two double-buffered W-chunks with explicit DMA,
using the identity

    est = K (.) E = u u^T X        (s cancels)

to merge the multiplier update and the next Gram accumulation into ONE
sweep per Lagrangian iteration:

    per chunk c:  load A0_c (DMA, overlapped);
                  w_c  = u^T X_c                      # E of the previous
                  X'_c = max(X_c - step (u w_c - A0_c), A0_c)
                  B   += gram(X'_c)                   # next iteration's u
    then          u <- power(B, u)

(the final E sweep reads the resident X and needs no A0 DMA at all)

HBM traffic is ONE p*W-sized A0 read per inner iteration (the multipliers
never leave VMEM) vs the XLA path's ~5 materializations; all elementwise
work happens fused in VMEM on chunk-sized tiles.  The Gram runs on the
MXU from bf16 panels exactly like the resident kernel (same precision
class, PARITY.md deviation 5); the per-iteration w contraction and the
returned E are f32.

Chunks are unrolled statically (W and the chunk width are compile-time
constants), so all VMEM slicing uses static lane offsets; Mosaic rejects
HBM scratch allocations, which this design never needs.

Numerics match ops/pallas_nmf.py::_nmf_loop up to reduction order: same
cold/warm power schemes on the accumulated Gram, same Lagrangian update.
Parity is gated in tests/test_stream.py against the XLA path
(core/nmf.py::nmf_masked), the semantic reference.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from degnorm_tpu.ops.pallas_nmf import (_EPS, _VMEM_BUDGET, _gram,
                                        _gram_mxu, _pack_groups,
                                        _gram_from_groups, _power,
                                        _power_warm)

# Minimum chunk width streamed through VMEM. 1024 lanes x 4 B = 4 KB
# contiguous per (gene, sample) row — comfortably efficient DMA; every
# bucket width the packer emits above the resident kernel's gate is a
# multiple.  The actual chunk width scales up to whatever VMEM affords
# (fewer, larger DMAs — the sweep is issue-latency sensitive).
_CHUNK_W = 1024
_STREAM_BG = 8


def _pick_chunk_w(p: int, W: int, itemsize: int = 4,
                  vmem_frac: float = 1.0) -> int:
    """Largest chunk width (multiple of _CHUNK_W dividing W) whose resident
    multipliers + two DMA slots + chunk temporaries stay inside budget.
    ``itemsize`` is the streamed dtype's (int16 raw streaming affords
    larger chunks than f32 — the DMA slots are the dtype-sized part).
    ``vmem_frac`` scales the budget (engine soft retry)."""
    # >= 2 chunks keeps the DMA/compute overlap (a single whole-row chunk
    # serializes every sweep behind its own load — measured slower even
    # though it minimizes issue count); whole-row is the fallback for
    # widths with no streamable divisor.
    cands = [m * _CHUNK_W for m in range(1, W // (2 * _CHUNK_W) + 1)
             if W % (m * _CHUNK_W) == 0]
    if not cands and W % 128 == 0:
        cands = [W]      # narrow-W, large-p shapes: single whole-row chunk
    best = 0
    for cw in cands:
        # f32 lam block + 2 dtype-sized DMA slots + ~3 f32 chunk temporaries
        vmem = _STREAM_BG * p * (4 * W + 2 * itemsize * cw + 3 * 4 * cw)
        if vmem <= _VMEM_BUDGET * vmem_frac:
            best = cw
    return best


def _gram_chunk(X, gram_mode):
    """(bg, p, Wc) -> (bg, p, p) partial Gram of one chunk."""
    if gram_mode == "vpu":
        return _gram(X)
    if gram_mode == "mxu":         # pure-f32 Gram opt-out (PARITY.md §5)
        return _gram_mxu(X)
    p = X.shape[1]
    return _gram_from_groups(_pack_groups(X), p)


def _stream_kernel(act_ref, f_any, mask_ref, scale_ref, u0_ref,
                   k_ref, u_ref, e_ref,
                   lam, fc0, fc1, sem0, sem1, *,
                   nmf_iter, power_cold, power_warm, warm_plain,
                   gram_mode, resume, divide_scale, W, chunk_w):
    i = pl.program_id(0)
    bg, p = k_ref.shape
    nc = W // chunk_w
    g0 = i * bg
    dtype = k_ref.dtype
    slots = (fc0, fc1)
    sems = (sem0, sem1)

    def f_dma(c, slot, sem):
        return pltpu.make_async_copy(
            f_any.at[pl.ds(g0, bg), :, c * chunk_w:(c + 1) * chunk_w],
            slot, sem)

    def make_a0(c, raw):
        """Masked, scale-adjusted chunk — cast / divide / mask in the same
        order as the XLA path (engine._bucket_step + nmf_masked), so raw
        int16 streaming is bit-identical to reading the premasked f32
        form."""
        x = raw.astype(dtype)
        if divide_scale:
            x = x / scale_ref[0][None, :, None]
        return x * mask_ref[:, c * chunk_w:(c + 1) * chunk_w][:, None, :]

    def sweep(fn, init):
        """Double-buffered pass over F chunks: carry = fn(c, a0_c, carry)."""
        f_dma(0, slots[0], sems[0]).start()
        carry = init
        for c in range(nc):
            if c + 1 < nc:
                f_dma(c + 1, slots[(c + 1) % 2], sems[(c + 1) % 2]).start()
            f_dma(c, slots[c % 2], sems[c % 2]).wait()
            carry = fn(c, make_a0(c, slots[c % 2][:]), carry)
        return carry

    @pl.when(jnp.max(act_ref[:]) == 0.0)
    def _():
        k_ref[:] = jnp.zeros(k_ref.shape, dtype)
        u_ref[:] = jnp.zeros(u_ref.shape, dtype)
        e_ref[:] = jnp.zeros(e_ref.shape, dtype)

    @pl.when(jnp.max(act_ref[:]) > 0.0)
    def _():
        step = 1.0 / (nmf_iter ** 0.5)

        # ---- cold sweep: Gram of A0; seed the resident X with A0 ----
        # (X-form of the multiplier update, see ops/pallas_nmf.py::
        # _nmf_loop — the ``lam`` scratch holds X = A0 + lambda)
        def cold(c, a0, B):
            lam[:, :, c * chunk_w:(c + 1) * chunk_w] = a0
            return B + _gram_chunk(a0, gram_mode)

        B = sweep(cold, jnp.zeros((bg, p, p), dtype))

        if resume:
            u = _power(B, u0_ref[:], power_cold)
        else:
            u = _power(B, jnp.full((bg, p), 1.0 / (p ** 0.5), dtype),
                       power_cold)

        # ---- merged Lagrangian sweeps ----
        def iter_body(_, carry):
            u, _B = carry

            def chunk(c, a0, B):
                xc = lam[:, :, c * chunk_w:(c + 1) * chunk_w]
                w = jnp.sum(xc * u[:, :, None], axis=1)       # (bg, Wc)
                est = u[:, :, None] * w[:, None, :]
                x_new = jnp.maximum(xc - step * (est - a0), a0)
                lam[:, :, c * chunk_w:(c + 1) * chunk_w] = x_new
                return B + _gram_chunk(x_new, gram_mode)

            B = sweep(chunk, jnp.zeros((bg, p, p), dtype))
            u = (_power_warm(B, u, warm_plain) if warm_plain
                 else _power(B, u, power_warm))
            return u, B

        u, B = jax.lax.fori_loop(0, nmf_iter, iter_body, (u, B))

        Bu = jnp.sum(B * u[:, None, :], axis=2)
        s = jnp.sqrt(jnp.maximum(jnp.sum(u * Bu, axis=1), 0.0))  # (bg,)

        # ---- final pass: E = X^T u / s (f32) — X is VMEM-resident, so
        # this needs no A0 DMA sweep at all ----
        for c in range(nc):
            x = lam[:, :, c * chunk_w:(c + 1) * chunk_w]
            w = jnp.sum(x * u[:, :, None], axis=1)
            e_ref[:, c * chunk_w:(c + 1) * chunk_w] = w / (s[:, None] + _EPS)
        k_ref[:] = u * s[:, None]
        u_ref[:] = u


def streamed_supported(F_shape, dtype) -> bool:
    """Streamed-path prerequisites: float32 and a chunking whose
    VMEM-resident multiplier block plus chunk buffers fit the budget.
    Meant for shapes the resident kernel rejects; the caller checks that
    gate first."""
    G, p, W = F_shape
    return (jnp.dtype(dtype) == jnp.float32
            and _pick_chunk_w(p, W) > 0)


def nmf_masked_streamed(
    F: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    nmf_iter: int,
    power_iters_cold: int = 30,
    power_iters_warm: int = 6,
    interpret: bool = False,
    gene_active: Optional[jnp.ndarray] = None,
    gram_mode: str = "auto",
    power_warm_plain: int = 0,
    u0: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for core.nmf.nmf_masked (method="power") for
    blocks too wide for the VMEM-resident kernel.  Same contract as
    nmf_masked_pallas including zeroed outputs for skipped blocks.

    The column mask is applied inside the kernel (per streamed chunk), so
    the premasked f32 A0 never materializes in HBM.  With ``scale`` (p,),
    ``F`` may be the engine's RAW device-resident coverage — typically
    int16 at HALF the streaming bytes — and each chunk computes
    ``F.astype(f32) / scale * mask``, the exact op order of the XLA path
    (engine._bucket_step's adjust + nmf_masked's mask), so results are
    bit-identical to passing the pre-adjusted f32 form."""
    G, p, W = F.shape
    cdt = jnp.float32
    bg = _STREAM_BG
    G_pad = ((G + bg - 1) // bg) * bg
    if G_pad != G:
        F = jnp.pad(F, ((0, G_pad - G), (0, 0), (0, 0)))
    mask_f = mask.astype(cdt)
    if G_pad != G:
        mask_f = jnp.pad(mask_f, ((0, G_pad - G), (0, 0)))
    if gene_active is None:
        act = jnp.ones((G_pad, 1), cdt)
    else:
        act = jnp.pad(gene_active.astype(cdt), (0, G_pad - G))[:, None]
    resume = u0 is not None
    u0_arr = (jnp.pad(u0.astype(cdt), ((0, G_pad - G), (0, 0)))
              if resume else jnp.zeros((G_pad, p), cdt))
    divide_scale = scale is not None
    scale_arr = (scale.astype(cdt)[None, :] if divide_scale
                 else jnp.ones((1, p), cdt))
    if gram_mode in ("auto", "packed_slice", "mxu_bf16"):
        gram_mode = "vpu" if interpret else "packed"
    # "mxu" (the documented pure-f32 Gram opt-out) and "vpu" pass through
    # unchanged — _gram_chunk honors both without bf16 panels.

    chunk_w = _pick_chunk_w(p, W, itemsize=jnp.dtype(F.dtype).itemsize)
    if chunk_w == 0:
        raise ValueError(
            f"shape (G={G}, p={p}, W={W}) has no VMEM-feasible chunking; "
            "gate calls with streamed_supported() first")
    kernel = functools.partial(
        _stream_kernel, nmf_iter=nmf_iter, power_cold=power_iters_cold,
        power_warm=power_iters_warm, warm_plain=power_warm_plain,
        gram_mode=gram_mode, resume=resume, divide_scale=divide_scale,
        W=W, chunk_w=chunk_w)

    K, u, E = pl.pallas_call(
        kernel,
        grid=(G_pad // bg,),
        in_specs=[
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bg, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G_pad, p), cdt),
            jax.ShapeDtypeStruct((G_pad, p), cdt),
            jax.ShapeDtypeStruct((G_pad, W), cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((bg, p, W), cdt),
            pltpu.VMEM((bg, p, chunk_w), F.dtype),
            pltpu.VMEM((bg, p, chunk_w), F.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(act, F, mask_f, scale_arr, u0_arr)
    return K[:G], E[:G], u[:G]
