"""Pallas kernel: one-pixel attention over an int8-quantized KV cache.

Motivation (NOTES_r1.md): storing K/V caches in int8 should halve the
dominant HBM traffic of AR sampling, but XLA materializes the int8->bf16
convert of the whole cache before the dot, negating the win. This kernel
loads the int8 cache rows into VMEM, converts in-register, and applies the
per-row scales inside — HBM sees only int8.

Shapes (per call = one pixel, one decoder layer):
  q     (b, na, da)      bf16/f32 — query at the current pixel
  k8/v8 (b, na, CL, da)  int8     — quantized cache
  ks/vs (b, na, CL)      f32      — per-row absmax scales
  extra (b_or_1, na, CL) f32      — bias row + causal/-inf mask, precombined
returns (b, na, da) in q.dtype.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def cache_attention_xla(q, k8, ks, v8, vs, extra, scale):
    """Reference formulation (what XLA makes of it)."""
    logits = jnp.einsum("bad,bajd->baj", q.astype(jnp.float32),
                        k8.astype(jnp.float32)) * scale
    logits = logits * ks + extra
    w = jax.nn.softmax(logits, axis=-1) * vs
    out = jnp.einsum("baj,bajd->bad", w.astype(jnp.float32),
                     v8.astype(jnp.float32))
    return out.astype(q.dtype)


def cache_attention_pallas(q, k8, ks, v8, vs, extra, scale, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, na, da = q.shape
    CL = k8.shape[2]

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, e_ref, o_ref):
        for a in range(na):  # static unroll over heads
            qa = q_ref[0, a].astype(jnp.float32).reshape(1, da)
            kk = k_ref[0, a].astype(jnp.float32)  # (CL, da) from int8
            logits = jax.lax.dot_general(
                qa, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (1, CL)
            logits = logits * ks_ref[0, a].reshape(1, CL) + e_ref[0, a].reshape(1, CL)
            m = jnp.max(logits, axis=1, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            w = w * vs_ref[0, a].reshape(1, CL)
            vv = v_ref[0, a].astype(jnp.float32)  # (CL, da)
            out = jnp.dot(w, vv, preferred_element_type=jnp.float32)  # (1, da)
            o_ref[0, a] = out.reshape(da).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, na, da), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, na, da), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, na, da), q.dtype),
        interpret=interpret,
    )(q, k8, ks, v8, vs, extra)


# Measured on v5e (b=64, na=8, CL=256, da=128, 256-iteration scan):
#   pallas int8: 256 us/call | xla int8: 123 us/call | xla bf16: 107 us/call
# Verdict: XLA does NOT materialize a converted cache (int8 ~ bf16 there),
# and this grid-(b,) kernel loses 2x to XLA's pipelining — the per-pixel
# attention is latency-limited, not HBM-limited, at these shapes. Kept as a
# documented experiment; the sampler stays on the XLA formulation.


# --------------------------------------------------------------------------
# Decode attention with native int8 MXU dots (round 3)
# --------------------------------------------------------------------------
#
# Why a second kernel: every measured int8 cache-read path that CONVERTS the
# cache elementwise tops out at ~100-120 GB/s on v5e — the VPU's int8->f32
# convert runs at 1 element/lane/cycle, which IS that rate (128 lanes x 1 B
# x ~0.94 GHz). The r3 micro-probes (since deleted; NOTES_r3.md) read XLA's
# batched cache dots at 116 GB/s, a convert-then-bf16-dot Pallas kernel at
# 87, a pure int8 reduce at 76 — but tools/mfu.py --sample's end-to-end
# accounting (r4) shows the REAL sampler's cache dots run ~5x faster: the
# isolated probes serialized on the convert, while in the full step XLA
# fuses the convert into the contraction and pipelines the 8 layers' DMA.
# The MXU, by contrast, ingests int8
# operands natively at 2 elements/lane/cycle (v5e int8 peak is 2x bf16), so
# a kernel whose big operands reach the MXU AS int8 — dequantizing only the
# small (na, cl) logits / (na, d) outputs — is the only formulation with
# headroom past ~120 GB/s.
#
# Layout: fused-lane caches (b, cl, d=na*da) so every dot runs the full 128
# lanes; q is expanded block-diagonally (head a occupies lanes [a*da,
# (a+1)*da)), which makes the per-head contraction one (na, d) @ (cl, d)^T
# MXU dot whose cross-head terms are exactly zero. The V-side dot computes
# (na, d) = w @ V with every head's weights applied to all lanes; the
# block-diagonal mask + sublane-sum keeps each head's own da lanes.
#
# Math matches the shipped mm_dtype='int8' XLA path (vt_incremental.py):
# same per-(b, head) q absmax quantization, same fold of the V scales into
# the softmax weights before their per-row quantization.


def decode_attention_i8_xla(qi_bd, sq, k4, ks, v4, vs, extra, scale):
    """XLA reference for the fused-lane int8-dot formulation (CPU tests)."""
    logits = jnp.einsum("bae,bje->baj", qi_bd.astype(jnp.int32),
                        k4.astype(jnp.int32)).astype(jnp.float32)
    logits = logits * (sq.astype(jnp.float32) * scale)
    logits = logits * ks.astype(jnp.float32) + extra
    w = jax.nn.softmax(logits, axis=-1) * vs.astype(jnp.float32)
    sw = jnp.max(jnp.abs(w), axis=-1, keepdims=True) / 127.0
    wi = jnp.clip(jnp.round(w / (sw + 1e-8)), -127.0, 127.0)
    outf = jnp.einsum("baj,bje->bae", wi, v4.astype(jnp.float32)) * sw
    na, d = qi_bd.shape[1], qi_bd.shape[2]
    da = d // na
    mask = (jax.lax.broadcasted_iota(jnp.int32, (na, d), 1) // da ==
            jax.lax.broadcasted_iota(jnp.int32, (na, d), 0))
    return (outf * mask[None]).sum(1)  # (b, d) f32


def _pick_btile(b: int) -> int:
    for t in (8, 4, 2):
        if b % t == 0:
            return t
    return 1


def _parallel_compiler_params(pltpu):
    """CompilerParams marking the (single) grid dim 'parallel' so Mosaic
    overlaps the per-tile DMAs; None on older pallas without the field."""
    try:
        return pltpu.CompilerParams(dimension_semantics=("parallel",))
    except TypeError:
        return None


def decode_attention_i8_pallas(qi_bd, sq, k4, ks, v4, vs, extra, scale, *,
                               out_dtype=jnp.bfloat16,
                               btile: Optional[int] = None,
                               interpret: Optional[bool] = None):
    """One pixel's attention for one decoder layer, int8 end to end.

    qi_bd (b, na, d) int8   block-diagonal quantized q
    sq    (b, na, 1) f32    q row scales (absmax/127)
    k4/v4 (b, cl, d) int8   fused-lane K/V caches
    ks/vs (b, na, cl)       per-row cache scales (f32 or bf16)
    extra (1, na, cl) f32   bias row + causal/-1e9 mask, b-independent
    Returns (b, d) in out_dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, na, d = qi_bd.shape
    cl = k4.shape[1]
    da = d // na
    if btile is None:
        btile = _pick_btile(b)
    assert b % btile == 0, \
        f"btile={btile} must divide the batch ({b}): the grid would " \
        f"silently skip the trailing {b % btile} rows"

    def kernel(q_ref, sq_ref, k_ref, ks_ref, v_ref, vs_ref, e_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (na, d), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (na, d), 0)
        mask = (lane // da == row).astype(jnp.float32)
        for i in range(btile):
            logits_i = jax.lax.dot_general(
                q_ref[i], k_ref[i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # (na, cl)
            logits = logits_i.astype(jnp.float32) * (
                sq_ref[i].astype(jnp.float32) * scale)
            logits = logits * ks_ref[i].astype(jnp.float32) + e_ref[0]
            m = jnp.max(logits, axis=1, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            w = w * vs_ref[i].astype(jnp.float32)
            sw = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
            wi = jnp.clip(jnp.round(w / (sw + 1e-8)), -127.0, 127.0
                          ).astype(jnp.int8)
            out_i = jax.lax.dot_general(
                wi, v_ref[i], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (na, d)
            outf = out_i.astype(jnp.float32) * sw
            o_ref[i] = jnp.sum(outf * mask, axis=0,
                               keepdims=True).astype(o_ref.dtype)

    # batch-tile programs are independent: let Mosaic overlap their DMAs
    compiler_params = _parallel_compiler_params(pltpu)
    return pl.pallas_call(
        kernel,
        grid=(b // btile,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((btile, na, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, na, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, cl, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, na, cl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, cl, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, na, cl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, cl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), out_dtype),
        interpret=interpret,
    )(qi_bd, sq, k4, ks, v4, vs, extra).reshape(b, d)


# --------------------------------------------------------------------------
# Full-buffer + live-length decode attention (round 5, VERDICT r4 #1b)
# --------------------------------------------------------------------------
#
# The lever named in vt_incremental.pixel_step's docstring: the sampler's
# segmented concat-grow re-copies the whole cache at every segment boundary
# (10.2% of measured HBM traffic at DSFVT b1024, tools/mfu.py --sample), and
# the r4 preallocate-then-slice attempt measured 3.5x SLOWER because XLA
# materializes the `cache[:, :live]` slice + its int8->bf16 convert. A
# kernel that takes the FULL preallocated buffer plus a live-length scalar
# sidesteps both: the buffer never moves, and only ceil(live/tile) row
# tiles are DMA'd per call.
#
# Mechanics: 2-D grid (batch tiles x row tiles), online-softmax (flash-
# decode) accumulation across row tiles in VMEM scratch, and the
# scalar-prefetched live length drives the BlockSpec index maps — row tiles
# past the live point alias to the last live tile, which Pallas's
# block-revisit detection turns into "no DMA at all" (consecutive grid
# steps with the same block index re-use the resident block). Compute for
# dead tiles is skipped with pl.when. The causal mask is derived in-kernel
# from the live length (rows >= live contribute exp(-inf) = 0), so stale
# rows from the PREVIOUS block run never need zeroing — the sampler reuses
# one buffer for the whole rollout with no shrink/grow/concat.
#
# Numerics: same int8 scheme as decode_attention_i8_pallas (per-(b, head)
# q absmax quantization, V scales folded into the softmax weights before
# their absmax quantization), except the weight quantization is per row
# TILE (finer granularity -> slightly tighter rounding) and the softmax is
# the online two-term recurrence (exact in exact arithmetic).


def decode_attention_i8_live_xla(live, qi_bd, sqr, k4, ksr, v4, vsr, extrar,
                                 scale):
    """XLA reference: full buffers masked at `live` (CPU tests).

    Takes the live kernel's ROW-MAJOR layouts (scales/bias (b|1, R, na),
    q scales (b, 1, na) — see decode_attention_i8_live_pallas) and
    transposes back to the (b, na, R) orientation of the single-pass
    reference."""
    cl = k4.shape[1]
    sq = jnp.swapaxes(sqr, 1, 2)
    ks = jnp.swapaxes(ksr, 1, 2)
    vs = jnp.swapaxes(vsr, 1, 2)
    extra = jnp.swapaxes(extrar, 1, 2)
    col = jnp.arange(cl)
    ex = jnp.where(col[None, None, :] >= live, jnp.float32(-1e9), extra)
    return decode_attention_i8_xla(qi_bd, sq, k4, ks, v4, vs, ex, scale)


def decode_attention_i8_live_pallas(live, qi_bd, sqr, k4, ksr, v4, vsr,
                                    extrar, scale, *,
                                    out_dtype=jnp.bfloat16,
                                    btile: Optional[int] = None,
                                    rtile: int = 64,
                                    interpret: Optional[bool] = None):
    """One pixel's attention over a FULL preallocated cache buffer.

    live   ()      int32   rows [0, live) are valid; the rest are never read
    qi_bd  (b, na, d) int8 block-diagonal quantized q
    sqr    (b, 1, na) f32  q row scales
    k4/v4  (b, R, d) int8  full fused-lane K/V buffers (R = block run)
    ksr/vsr (b, R, na)     per-row cache scales, ROW-major
    extrar (1, R, na) f32  bias rows (NO causal mask — applied from `live`)
    Returns (b, d) in out_dtype.

    Layout note (Mosaic tiling): every per-row operand keeps the row axis
    second-to-last and a small trailing axis that EQUALS the full array
    dim — (rtile, na) and (rtile, d) blocks are legal where the transposed
    (na, rtile) block is not (the lane dim must be 128-divisible or whole).
    The kernel therefore works in row-major orientation end to end:
    logits (rtile, na), accumulator (d, na), output (d, 1) — no in-kernel
    transposes, scales/bias multiply directly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, na, d = qi_bd.shape
    R = k4.shape[1]
    da = d // na
    if btile is None:
        btile = _pick_btile(b)
    assert b % btile == 0, f"btile={btile} must divide the batch ({b})"
    rtile = min(rtile, R)
    assert R % rtile == 0, f"rtile={rtile} must divide the buffer rows ({R})"
    n_rt = R // rtile
    live_arr = jnp.reshape(jnp.asarray(live, jnp.int32), (1,))

    def _last_live(lv):
        # index of the last row tile holding live rows (>= 0 even at live=0)
        return jnp.maximum((lv[0] + rtile - 1) // rtile - 1, 0)

    def q_map(i, j, lv):
        return (i, 0, 0)

    def row_map(i, j, lv):
        # dead tiles alias to the last live tile: consecutive identical
        # block indices -> Pallas re-uses the resident block, no DMA
        return (i, jnp.minimum(j, _last_live(lv)), 0)

    def extra_map(i, j, lv):
        return (0, jnp.minimum(j, _last_live(lv)), 0)

    def kernel(lv_ref, q_ref, sq_ref, k_ref, ks_ref, v_ref, vs_ref, e_ref,
               o_ref, m_ref, l_ref, acc_ref):
        j = pl.program_id(1)
        lv = lv_ref[0]
        live_tiles = jnp.maximum((lv + rtile - 1) // rtile, 1)

        @pl.when(j == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(j < live_tiles)
        def _live():
            col = j * rtile + jax.lax.broadcasted_iota(
                jnp.int32, (rtile, na), 0)
            dd = jax.lax.broadcasted_iota(jnp.int32, (d, na), 0)
            aa = jax.lax.broadcasted_iota(jnp.int32, (d, na), 1)
            hmask = (dd // da == aa).astype(jnp.float32)  # (d, na)
            for i in range(btile):
                logits_i = jax.lax.dot_general(
                    k_ref[i], q_ref[i],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (rtile, na)
                logits = logits_i.astype(jnp.float32) * (
                    sq_ref[i].astype(jnp.float32) * scale)
                logits = logits * ks_ref[i].astype(jnp.float32) + e_ref[0]
                logits = jnp.where(col >= lv, jnp.float32(-1e30), logits)
                m_old = m_ref[i]                      # (1, na)
                m_new = jnp.maximum(m_old,
                                    jnp.max(logits, axis=0, keepdims=True))
                m_ref[i] = m_new
                alpha = jnp.exp(m_old - m_new)        # (1, na)
                p = jnp.exp(logits - m_new)           # (rtile, na)
                l_ref[i] = l_ref[i] * alpha + jnp.sum(p, axis=0,
                                                      keepdims=True)
                pw = p * vs_ref[i].astype(jnp.float32)
                sw = jnp.max(jnp.abs(pw), axis=0, keepdims=True) / 127.0
                wi = jnp.clip(jnp.round(pw / (sw + 1e-8)), -127.0, 127.0
                              ).astype(jnp.int8)
                part = jax.lax.dot_general(
                    v_ref[i], wi,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (d, na)
                acc_ref[i] = acc_ref[i] * alpha + part.astype(jnp.float32) * sw
                # final live tile's write wins; (na -> 1) head fold
                out = acc_ref[i] / (l_ref[i] + 1e-30)  # (d, na)
                o_ref[i] = jnp.sum(out * hmask, axis=1,
                                   keepdims=True).astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // btile, n_rt),
        in_specs=[
            pl.BlockSpec((btile, na, d), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, 1, na), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, rtile, d), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, rtile, na), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, rtile, d), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, rtile, na), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rtile, na), extra_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, d, 1),
                               lambda i, j, lv: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((btile, 1, na), jnp.float32),   # running max
            pltpu.VMEM((btile, 1, na), jnp.float32),   # running denom
            pltpu.VMEM((btile, d, na), jnp.float32),   # running numerator
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d, 1), out_dtype),
        compiler_params=_live_compiler_params(pltpu),
        interpret=interpret,
    )(live_arr, qi_bd, sqr, k4, ksr, v4, vsr, extrar).reshape(b, d)


def _live_compiler_params(pltpu):
    """Batch tiles are independent ('parallel'); row tiles carry the online
    softmax recurrence ('arbitrary')."""
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    except TypeError:
        return None


def blockdiag_expand(q):
    """(b, na, da) -> (b, na, na*da) with head a's values in lanes
    [a*da, (a+1)*da) of row a, zeros elsewhere. Any dtype."""
    b, na, da = q.shape
    eye = jnp.eye(na, dtype=q.dtype)
    return (q[:, :, None, :] * eye[None, :, :, None]).reshape(b, na, na * da)


def decode_attention_xla(qbd, k4, v4, extra, scale):
    """XLA reference for the native-dtype fused-lane formulation."""
    logits = jnp.einsum("bae,bje->baj", qbd, k4,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + extra
    w = jax.nn.softmax(logits, axis=-1)
    outf = jnp.einsum("baj,bje->bae", w.astype(k4.dtype), v4,
                      preferred_element_type=jnp.float32)
    na, d = qbd.shape[1], qbd.shape[2]
    da = d // na
    mask = (jax.lax.broadcasted_iota(jnp.int32, (na, d), 1) // da ==
            jax.lax.broadcasted_iota(jnp.int32, (na, d), 0))
    return (outf * mask[None]).sum(1)  # (b, d) f32


def decode_attention_pallas(qbd, k4, v4, extra, scale, *,
                            out_dtype=jnp.bfloat16,
                            btile: Optional[int] = None,
                            interpret: Optional[bool] = None):
    """Native-dtype decode attention (kv_dtype='native' + attn_impl=
    'pallas'): same fused-lane/block-diagonal structure as the int8
    kernel but no quantization anywhere — bf16 operands feed the MXU
    directly (1 elem/lane/cycle vs int8's 2; 2x the bytes of the int8
    cache, but no rounding beyond bf16 itself).

    qbd (b, na, d) block-diagonal q; k4/v4 (b, cl, d); extra (1, na, cl)
    f32 bias + causal mask. Returns (b, d) in out_dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, na, d = qbd.shape
    cl = k4.shape[1]
    da = d // na
    if btile is None:
        btile = _pick_btile(b)
    assert b % btile == 0, \
        f"btile={btile} must divide the batch ({b}): the grid would " \
        f"silently skip the trailing {b % btile} rows"

    def kernel(q_ref, k_ref, v_ref, e_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (na, d), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (na, d), 0)
        mask = (lane // da == row).astype(jnp.float32)
        for i in range(btile):
            logits = jax.lax.dot_general(
                q_ref[i], k_ref[i],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (na, cl)
            logits = logits + e_ref[0]
            m = jnp.max(logits, axis=1, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            out = jax.lax.dot_general(
                w.astype(k_ref.dtype), v_ref[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (na, d)
            o_ref[i] = jnp.sum(out * mask, axis=0,
                               keepdims=True).astype(o_ref.dtype)

    compiler_params = _parallel_compiler_params(pltpu)
    return pl.pallas_call(
        kernel,
        grid=(b // btile,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((btile, na, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, cl, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, cl, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, cl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), out_dtype),
        interpret=interpret,
    )(qbd, k4, v4, extra).reshape(b, d)
