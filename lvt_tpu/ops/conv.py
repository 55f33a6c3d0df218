"""Convolution primitives with exact reference semantics.

Layouts are TPU-native channels-last: NHWC for 2D (VQ-VAE), NDHWC for 3D
(Video Transformer); weights HWIO / DHWIO. The torch->JAX checkpoint
converter transposes from torch's OIHW.

Three reference behaviors rebuilt here:

* ``conv2d`` / ``conv_transpose2d`` — plain strided convs matching
  torch.nn.Conv2d / ConvTranspose2d arithmetic (used by ResEncoder /
  ResDecoder, reference resencoder.py:43-76, resdecoder.py:44-75).
* ``masked_conv3d`` — the decoder's causal 3-D conv. The reference mutates
  ``conv.weight.data`` inside forward to zero future taps
  (vt_utils.py:196-200); we multiply by a constant binary mask instead —
  same math, pure function.
* ``subscale_context_encode`` — the VT encoder's Conv3d over a one-hot
  (nc*nv)-channel code video (videotransformer.py:17,52). Materializing the
  2048-channel one-hot is pure waste: conv(one_hot(x)) is a sum of embedding
  lookups, one per (channel, kernel tap). We store the weight as an
  embedding table (nc, kt, kh, kw, nv, de) and do a single fused gather —
  mathematically identical (tested against the dense one-hot conv), ~100x
  less compute/memory traffic.
"""

import os
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, w, b=None, stride=1, padding=0):
    """NHWC conv. w: (kh, kw, in, out); padding int or (ph, pw).
    Inputs follow the weight dtype (bf16 mixed-precision compute)."""
    x = x.astype(w.dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose2d(x, w, b=None, stride=2, padding=1):
    """torch.nn.ConvTranspose2d semantics on NHWC.

    w: (kh, kw, out, in) — note transposed-conv weight carries (out, in) in
    torch's (in, out, kh, kw) order; we store (kh, kw, out, in) and flip
    spatially here. Output size = (n-1)*s - 2p + k.
    """
    x = x.astype(w.dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    kh, kw = w.shape[0], w.shape[1]
    w_flip = w[::-1, ::-1]  # spatial flip
    w_flip = jnp.swapaxes(w_flip, 2, 3)  # -> (kh, kw, in, out)
    out = jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1, 1),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0]),
                 (kw - 1 - padding[1], kw - 1 - padding[1])],
        lhs_dilation=stride,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


@lru_cache(maxsize=8)
def _causal_mask_np(kt: int, kh: int, kw: int) -> np.ndarray:
    """(kt, kh, kw, 1, 1) binary mask zeroing the current pixel and
    everything to its right in the current row of the current frame
    (reference vt_utils.py:191-199)."""
    m = np.ones((kt, kh, kw, 1, 1), dtype=np.float32)
    m[kt - 1, kh - 1, kw // 2 :] = 0.0
    return m


def masked_conv3d(x, w, b=None):
    """Causal 3-D conv on (b, t, h, w, c); w: (kt, kh, kw, in, out).

    Padding (t: kt-1 front, h: kh-1 top, w: centered) keeps the output the
    same size while only past raster positions feed each output.
    """
    x = x.astype(w.dtype)
    kt, kh, kw = w.shape[:3]
    w = w * jnp.asarray(_causal_mask_np(kt, kh, kw), w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1, 1),
        padding=[(kt - 1, 0), (kh - 1, 0), (kw // 2, kw // 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out


def conv3d_strided(x, w, b=None, stride=(1, 1, 1)):
    """Plain VALID strided 3-D conv on (b, t, h, w, c); w: (kt,kh,kw,in,out)."""
    x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=tuple(stride),
        padding=[(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        out = out + b
    return out


def _ctx_gather_indices(ctx, stride, table_shape):
    """Strided window indices into the padded flat table: (b, nc*K, t, h, w)
    int32 with per-slot base offsets baked in (pad -> row 0 of each slot)."""
    nc, kt, kh, kw, nv, de = table_shape
    st, sh, sw = stride
    b = ctx.shape[0]
    Tp, Hp, Wp = ctx.shape[2:]
    t = (Tp - kt) // st + 1
    h = (Hp - kh) // sh + 1
    w = (Wp - kw) // sw + 1
    wins = []
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                wins.append(
                    jax.lax.slice(
                        ctx,
                        (0, 0, dt, dh, dw),
                        (b, nc, dt + (t - 1) * st + 1, dh + (h - 1) * sh + 1, dw + (w - 1) * sw + 1),
                        (1, 1, st, sh, sw),
                    )
                )
    K = kt * kh * kw
    idx = jnp.stack(wins, axis=2)  # (b, nc, K, t, h, w)
    idx = jnp.clip(idx + 1, 0, nv)  # pad (-1) -> row 0
    base = (jnp.arange(nc * K, dtype=idx.dtype) * (nv + 1)).reshape(1, nc, K, 1, 1, 1)
    return (idx + base).reshape(b, nc * K, t, h, w), (t, h, w)


def _ctx_encode_impl(ctx, table, stride):
    nc, kt, kh, kw, nv, de = table.shape
    K = kt * kh * kw
    gidx, (t, h, w) = _ctx_gather_indices(ctx, stride, table.shape)
    b = gidx.shape[0]
    # (nc*K, nv+1, de) with row 0 = zeros for pad
    flat = table.reshape(nc * K, nv, de)
    flat = jnp.concatenate([jnp.zeros((nc * K, 1, de), flat.dtype), flat], axis=1)
    flat = flat.reshape(nc * K * (nv + 1), de)
    impl = os.environ.get("LVT_CTX_IMPL", "")
    if not impl:
        # auto-select: gather_sum materializes a (b, ncK, thw, de)
        # intermediate before reducing — 11.25 GB at DSTSVT b1024 (nc*K=45
        # for its (5,3,3) kernel), a hard HBM OOM. chain measured
        # perf-neutral on chip in both training (DSFVT b64: 53.9 vs
        # 54.0 ms/it) and sampling (DSTSVT b512: 517.7 vs 520.4 fps), so
        # switch to it whenever the intermediate would crowd HBM (>2 GB).
        inter = b * nc * K * t * h * w * de * flat.dtype.itemsize
        impl = "chain" if inter > 2 ** 31 else "gather_sum"
    if impl == "chunk":
        # chunked gather_sum (round 5, VERDICT r4 #2) — MEASURED NEGATIVE,
        # kept as a knob: gather CH slots at a time and reduce them in one
        # fusion, so the accumulator round-trips drop nc*K -> ceil(nc*K/CH)
        # while the materialized intermediate stays under the 2 GB bound.
        # On-chip at DSTSVT b1024 sampling: 6.684 ms/step vs chain's 5.168
        # (+29%) — XLA does NOT fuse the multi-slot gather into the chunk
        # reduce, so each chunk writes+reads its (b, thw, CH, de)
        # intermediate (~380 MB/step extra at CH=7, matching the +1.52
        # ms/step at peak BW exactly), whereas chain's one-row-per-slot
        # take+add DOES fuse and only round-trips the (b, thw, de)
        # accumulator (~0.23 ms/step, the r5 trace's 2803 pad ops).
        thw = t * h * w
        CH = int(os.environ.get("LVT_CTX_CHUNK", "0")) or max(
            1, min(nc * K,
                   int(2 ** 31 // (b * thw * de * flat.dtype.itemsize))))
        gperm = jnp.moveaxis(gidx.reshape(b, nc * K, -1), 1, 2)  # (b,thw,ncK)
        acc = jnp.zeros((b, thw, de), flat.dtype)
        for s0 in range(0, nc * K, CH):
            part = jnp.take(flat, gperm[:, :, s0:s0 + CH].reshape(-1),
                            axis=0)
            acc = acc + part.reshape(b, thw, -1, de).sum(axis=2)
        return acc.reshape(b, t, h, w, de)
    if impl == "chain":
        # per-slot gather + running add: no (b, ncK, thw, de) intermediate
        # ever materializes if XLA fuses the add chain into one loop fusion
        gsl = gidx.reshape(b, nc * K, -1)  # (b, ncK, thw)
        acc = jnp.zeros((b, t * h * w, de), flat.dtype)
        for s in range(nc * K):
            acc = acc + jnp.take(flat, gsl[:, s].reshape(-1),
                                 axis=0).reshape(b, -1, de)
        return acc.reshape(b, t, h, w, de)
    if impl == "onehot":
        # the backward's formulation applied to the FORWARD: one MXU dot
        # per (channel, slot) — oh (b*thw, nv+1) @ table_slot (nv+1, de) —
        # instead of the latency-bound row gather (NOTES_r3: 36% of
        # roofline). Trades ncK one-hot builds (b*thw*(nv+1) each) for
        # MXU-rate streaming of the same bytes.
        gsl = gidx.reshape(b, nc * K, -1)  # (b, ncK, thw)
        cols = jnp.arange(nv + 1, dtype=gidx.dtype)[None, :]
        acc = jnp.zeros((b * t * h * w, de), flat.dtype)
        for s in range(nc * K):
            local = gsl[:, s, :].reshape(-1, 1) - s * (nv + 1)
            oh = (local == cols).astype(flat.dtype)  # (b*thw, nv+1)
            acc = acc + jax.lax.dot_general(
                oh, flat[s * (nv + 1):(s + 1) * (nv + 1)],
                dimension_numbers=(((1,), (0,)), ((), ())))
        return acc.reshape(b, t, h, w, de)
    if impl == "minor":
        # reduce over the axis adjacent to the vector lanes instead of the
        # majormost one (strided reductions read HBM at stride ncK*thw*de)
        gperm = jnp.moveaxis(gidx.reshape(b, nc * K, -1), 1, 2)  # (b,thw,ncK)
        emb = jnp.take(flat, gperm.reshape(-1), axis=0)
        return emb.reshape(b, t * h * w, nc * K, de).sum(axis=2).reshape(
            b, t, h, w, de)
    emb = jnp.take(flat, gidx.reshape(-1), axis=0)  # (b*nc*K*thw, de)
    return emb.reshape(b, nc * K, t, h, w, de).sum(axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _ctx_encode(ctx, table, stride, nv, kernel):
    return _ctx_encode_impl(ctx, table, stride)


def _ctx_encode_fwd(ctx, table, stride, nv, kernel):
    # residuals must be jax types: carry the table dtype via a 0-size array
    return (_ctx_encode_impl(ctx, table, stride),
            (ctx, jnp.zeros((0,), table.dtype)))


def _ctx_encode_bwd(stride, nv, kernel, res, g):
    """d(table) via one-hot matmuls, one per (channel, kernel-slot).

    The gather's natural transpose is a scatter-add of b*thw*nc*K rows into
    nv buckets — massively colliding indices that XLA serializes on TPU
    (measured: seconds per step on the (3,3)-kernel DSSVT geometry). The
    one-hot matmul computes the same segment sums on the MXU.

    The kernel size comes through the nondiff args: reconstructing it as
    Tp - (t-1)*st only holds when (Tp - kt) divides st — false for the
    even-kernel geometries shifted_shape produces (Tp = 2*(kt//2)+1 +
    (t-1)*st)."""
    ctx, dtype_proto = res
    nc = ctx.shape[1]
    kt, kh, kw = kernel
    de = g.shape[-1]
    K = kt * kh * kw
    table_shape = (nc, kt, kh, kw, nv, de)
    gidx, _ = _ctx_gather_indices(ctx, stride, table_shape)
    b = gidx.shape[0]
    gf = g.reshape(-1, de)  # (b*thw, de)
    gsl = gidx.reshape(b, nc * K, -1)  # (b, ncK, thw)
    cols = jnp.arange(nv + 1, dtype=gidx.dtype)[None, :]
    slots = []
    for s in range(nc * K):
        local = gsl[:, s, :].reshape(-1, 1) - s * (nv + 1)  # (b*thw, 1)
        oh = (local == cols).astype(g.dtype)  # (b*thw, nv+1)
        slots.append(jax.lax.dot_general(  # oh^T @ g: (nv+1, de)
            oh, gf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dflat = jnp.stack(slots)  # (ncK, nv+1, de) fp32
    dtable = dflat[:, 1:, :].reshape(nc, kt, kh, kw, nv, de)
    dctx = np.zeros(ctx.shape, dtype=jax.dtypes.float0)  # int input
    return dctx, dtable.astype(dtype_proto.dtype)


_ctx_encode.defvjp(_ctx_encode_fwd, _ctx_encode_bwd)


def subscale_context_encode(
    ctx: jnp.ndarray,
    table: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: Tuple[int, int, int],
    nv: int,
) -> jnp.ndarray:
    """Fused gather equivalent of Conv3d(one_hot(ctx)) with VALID padding.

    ctx:   (b, nc, T', H', W') int codes, negative = pad (contributes zero —
           the reference zeroes the one-hot rows of padded positions,
           videotransformer.py:41-48)
    table: (nc, kt, kh, kw, nv, de) embedding-form conv weight
    Returns (b, t, h, w, de).

    Forward is a gather (fast); the backward w.r.t. the table is a custom
    one-hot matmul (see _ctx_encode_bwd) instead of XLA's serialized
    scatter-add.
    """
    nc, kt, kh, kw, nv_t, de = table.shape
    assert nv_t == nv
    emb = _ctx_encode(ctx, table, tuple(stride), int(nv), (kt, kh, kw))
    if bias is not None:
        emb = emb + bias
    return emb


def onehot_table_to_conv_weight(table: jnp.ndarray) -> jnp.ndarray:
    """(nc, kt, kh, kw, nv, de) -> DHWIO weight (kt, kh, kw, nc*nv, de) for
    the dense one-hot formulation (used by equivalence tests)."""
    nc, kt, kh, kw, nv, de = table.shape
    w = table.transpose(1, 2, 3, 0, 4, 5)  # kt, kh, kw, nc, nv, de
    return w.reshape(kt, kh, kw, nc * nv, de)
