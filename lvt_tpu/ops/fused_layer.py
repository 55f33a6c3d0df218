"""Whole-layer fused Pallas forward for the block-local transformer layer.

One kernel program computes, for one attention block of n tokens:

    LN -> per-head QKV -> softmax(QK^T/sqrt(da) + B [+ causal]) V
       -> head-accumulated proj + residual -> LN -> FFN + residual

entirely in VMEM — the activations never round-trip HBM between the ~10
fusions XLA otherwise schedules (measured 0.81 ms/layer forward at DSFVT
b64, of which only ~0.49 ms is MXU GEMM time; the rest is inter-fusion
traffic and layout copies).

The backward is the XLA vjp of the unfused layer (`mha_tokens` +
`ffn_tokens`, ops/attention.py) recomputed from the saved inputs — i.e.
the fused layer IS its own remat unit, so callers skip `jax.checkpoint`
around it. The XLA recompute keeps the fused Pallas attention bwd kernel
on its inner path.

Gated (TPU.FUSED_LAYER) because Mosaic on v5e is fragile (CLAUDE.md):
used only when every layer shares one block geometry and `da % 128 == 0`
(head slices stay lane-aligned; true for all shipped configs, da=128).

Reference semantics anchor: vt_attention.py:84-138 (pre-LN heads,
concat-proj residual, LN-Linear-ReLU-Linear FFN residual).
"""

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ln_fwd_f32(xf, gamma, beta):
    """fp32 LayerNorm forward on (n, d): returns (y, yhat, r).

    The ONE definition of the LN recompute shared by the fused forward,
    both backward kernels, and the XLA tail — the remat backward must
    replay bit-identical LN math or the gradients silently drift.
    Everything stays 2-D (v5e Mosaic crashes on 1-D intermediates)."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-5)
    yhat = (xf - mu) * r
    return yhat * gamma + beta, yhat, r


def _ln_bwd_f32(dy, yhat, r, gamma):
    """fp32 LayerNorm backward on (n, d): returns (dgamma_row, dbeta_row,
    dx) with the grad rows kept (1, d)."""
    dls = jnp.sum(dy * yhat, axis=0, keepdims=True)
    dlb = jnp.sum(dy, axis=0, keepdims=True)
    dyh = dy * gamma
    m1 = jnp.mean(dyh, axis=1, keepdims=True)
    m2 = jnp.mean(dyh * yhat, axis=1, keepdims=True)
    return dls, dlb, r * (dyh - m1 - yhat * m2)


def _wqkv_flat(wq, wk, wv):
    """(na, d, da) x3 -> (d, 3*na*da), columns [q heads | k heads | v heads].

    One wide MXU operand instead of 3*na per-head (d, da) dots: the
    per-head dots have a single 128-lane output tile each and pipeline
    poorly; the fused dot's output is 3*na*da lanes wide. The transpose
    costs one small XLA copy per layer call (~3 MB bf16 at DSFVT),
    measured well under the MXU time it buys back.
    """
    na, d, da = wq.shape
    flat = lambda w: w.transpose(1, 0, 2).reshape(d, na * da)
    return jnp.concatenate([flat(wq), flat(wk), flat(wv)], axis=1)


def fused_layer_tokens_pallas(tok, p, bias, mask: Optional[np.ndarray], *,
                              with_x2: bool = False,
                              interpret: bool = False):
    """tok: (nb, n, d); p: BlockAttnParams; bias: (na, n, n) fp32;
    mask: (n, n) bool or None. Returns (nb, n, d) in tok.dtype — or
    (out, x2) with the post-attention residual when with_x2 (saved by the
    AD wrapper so the FFN-half backward kernel skips its recompute)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, n, d = tok.shape
    na, _, da = p.wq.shape
    scale = 1.0 / float(np.sqrt(da))
    mask_arr = None if mask is None else jnp.asarray(mask[None], jnp.bool_)

    # 1-D params go in as (1, d) rows (v5e Mosaic: no 1-D operands)
    row = lambda a: jnp.asarray(a).reshape(1, -1)

    def kernel(*refs):
        if with_x2:
            *refs, x2_ref = refs
        if mask_arr is not None:
            (x_ref, lns_ref, lnb_ref, wqkv_ref, proj_ref,
             flns_ref, flnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, bias_ref,
             m_ref, o_ref) = refs
        else:
            (x_ref, lns_ref, lnb_ref, wqkv_ref, proj_ref,
             flns_ref, flnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, bias_ref,
             o_ref) = refs
        io_dt = x_ref.dtype

        def ln(xf, s_ref, b_ref):
            return _ln_fwd_f32(xf, s_ref[...].astype(jnp.float32),
                               b_ref[...].astype(jnp.float32))[0]

        x = x_ref[0].astype(jnp.float32)  # (n, d)
        y = ln(x, lns_ref, lnb_ref).astype(io_dt)

        # attention: one wide QKV dot, per-head softmax, one wide proj dot.
        # Mosaic requires fp32 matmul accumulators (bf16
        # preferred_element_type fails verification on v5e); rounding the
        # fp32 result to io on store matches the old q.astype(io) exactly.
        qkv = jnp.dot(y, wqkv_ref[...],
                      preferred_element_type=jnp.float32).astype(io_dt)
        os = []
        for a in range(na):
            q = qkv[:, a * da:(a + 1) * da]
            k = qkv[:, (na + a) * da:(na + a + 1) * da]
            v = qkv[:, (2 * na + a) * da:(2 * na + a + 1) * da]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + bias_ref[a].astype(jnp.float32)
            if mask_arr is not None:
                s = jnp.where(m_ref[0], jnp.float32(-1e4), s)
            prob = jax.nn.softmax(s, axis=-1)
            os.append(jnp.dot(prob.astype(io_dt), v,
                              preferred_element_type=jnp.float32)
                      .astype(io_dt))  # (n, da)
        o_all = jnp.concatenate(os, axis=1)  # (n, na*da)
        acc = jnp.dot(o_all, proj_ref[...],
                      preferred_element_type=jnp.float32)
        x2 = acc + x  # residual, fp32
        if with_x2:
            x2_ref[0] = x2.astype(x2_ref.dtype)

        # FFN
        y2 = ln(x2, flns_ref, flnb_ref).astype(io_dt)
        f = jnp.dot(y2, w1_ref[...], preferred_element_type=jnp.float32)
        f = jax.nn.relu(f + b1_ref[...].astype(jnp.float32))
        g = jnp.dot(f.astype(io_dt), w2_ref[...],
                    preferred_element_type=jnp.float32)
        g = g + b2_ref[...].astype(jnp.float32)
        o_ref[0] = (g + x2).astype(o_ref.dtype)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        const((1, d)), const((1, d)),
        const((d, 3 * na * da)),
        const((na * da, d)),
        const((1, d)), const((1, d)),
        const((d, d)), const((1, d)), const((d, d)), const((1, d)),
        const((na, n, n)),
    ]
    args = [tok, row(p.ln_scale), row(p.ln_bias),
            _wqkv_flat(p.wq, p.wk, p.wv), p.proj,
            row(p.ffn_ln_scale), row(p.ffn_ln_bias), p.ffn_w1, row(p.ffn_b1),
            p.ffn_w2, row(p.ffn_b2), bias]
    if mask_arr is not None:
        in_specs.append(const((1, n, n)))
        args.append(mask_arr)

    tile = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_specs = [tile, tile] if with_x2 else tile
    out_shape = ([jax.ShapeDtypeStruct((nb, n, d), tok.dtype)] * 2
                 if with_x2 else jax.ShapeDtypeStruct((nb, n, d), tok.dtype))
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def ffn_half_bwd_pallas(x2, g, p, *, interpret: bool = False):
    """Fused backward of the FFN half: out = x2 + FFN(LN(x2)).

    x2: (nb, n, d) post-attention residual (saved by the forward);
    g: (nb, n, d) cotangent at the layer output. Returns
    (dx2, dw1, db1, dw2, db2, dls, dlb) — the weight/LN grads accumulated
    in fp32 across the block grid inside VMEM (grid iteration on TPU is
    sequential, same recipe as the attention bwd kernel's dbias).

    Replaces ~6 XLA fusions per layer (FFN forward recompute, two GEMM
    vjps, relu mask, LN backward, residual add) with one VMEM-resident
    program; the accumulator set (2 d^2 fp32 + 4 rows) is ~2.3 MB for
    d=512 — comfortably inside v5e VMEM, unlike the attention half whose
    dwq/dwk/dwv/dproj/dbias set does not fit.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, n, d = x2.shape
    row = lambda a: jnp.asarray(a).reshape(1, -1)

    def kernel(x2_ref, g_ref, fls_ref, flb_ref, w1_ref, b1_ref, w2_ref,
               dx2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dls_ref,
               dlb_ref):
        io_dt = x2_ref.dtype

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)
            dls_ref[...] = jnp.zeros_like(dls_ref)
            dlb_ref[...] = jnp.zeros_like(dlb_ref)

        x2 = x2_ref[0].astype(jnp.float32)  # (n, d)
        go = g_ref[0]
        go32 = go.astype(jnp.float32)

        # LN forward recompute (fp32, 2-D throughout)
        gam = fls_ref[...].astype(jnp.float32)
        y2f, yhat, r = _ln_fwd_f32(x2, gam, flb_ref[...].astype(jnp.float32))
        y2 = y2f.astype(io_dt)

        f_pre = jnp.dot(y2, w1_ref[...], preferred_element_type=jnp.float32)
        f_pre = f_pre + b1_ref[...].astype(jnp.float32)
        f = jax.nn.relu(f_pre).astype(io_dt)

        # FFN backward
        dw2_ref[...] += jax.lax.dot_general(  # f^T @ go
            f, go, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_ref[...] += jnp.sum(go32, axis=0, keepdims=True)
        df = jax.lax.dot_general(  # go @ w2^T
            go, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfp = jnp.where(f_pre > 0.0, df, 0.0)
        dfp_io = dfp.astype(io_dt)
        dw1_ref[...] += jax.lax.dot_general(  # y2^T @ dfp
            y2, dfp_io, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[...] += jnp.sum(dfp, axis=0, keepdims=True)
        dy2 = jax.lax.dot_general(  # dfp @ w1^T
            dfp_io, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # LN backward
        dls_row, dlb_row, dx2_ln = _ln_bwd_f32(dy2, yhat, r, gam)
        dls_ref[...] += dls_row
        dlb_ref[...] += dlb_row
        dx2_ref[0] = (dx2_ln + go32).astype(dx2_ref.dtype)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dx2, dw1, db1, dw2, db2, dls, dlb = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[tile, tile, const((1, d)), const((1, d)), const((d, d)),
                  const((1, d)), const((d, d))],
        out_specs=[tile, const((d, d)), const((1, d)), const((d, d)),
                   const((1, d)), const((1, d)), const((1, d))],
        out_shape=[jax.ShapeDtypeStruct((nb, n, d), x2.dtype),
                   jax.ShapeDtypeStruct((d, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=interpret,
    )(x2, g, row(p.ffn_ln_scale), row(p.ffn_ln_bias), p.ffn_w1,
      row(p.ffn_b1), p.ffn_w2)
    dt = p.ffn_w1.dtype
    return (dx2, dw1.astype(dt), db1[0].astype(dt), dw2.astype(dt),
            db2[0].astype(dt), dls[0].astype(dt), dlb[0].astype(dt))


def attn_half_bwd_pallas(x, dx2, p, bias, mask: Optional[np.ndarray],
                         h0: int, h1: int, *, interpret: bool = False):
    """Fused backward of the attention half for heads [h0, h1).

    x: (nb, n, d) layer input; dx2: (nb, n, d) cotangent at the
    post-attention residual. Recomputes LN -> q/k/v -> softmax per head in
    VMEM and emits:

      dy_part  (nb, n, d)  — sum over these heads of dq wq^T + dk wk^T +
                             dv wv^T (LN backward is applied by the caller
                             on the total dy)
      dwqkv    (d, 3*nh*da) fp32 — flat [q heads | k heads | v heads]
                             columns (the _wqkv_flat layout); caller
                             unflattens to per-head (nh, d, da) trees
      dproj ((h1-h0)*da, d) fp32, dbias ((h1-h0), n, n) fp32
      — all grid-accumulated in VMEM.

    Split by heads because the full-na accumulator set (dwqkv 6.3 MB
    + dproj 2.1 + dbias 2.1 fp32) plus weights and score scratch exceeds
    v5e's ~16 MB VMEM; at na/2 heads per call everything fits with room
    for double buffering.

    All GEMMs whose output is a single 128-lane tile per head (QKV
    recompute, do, dy, weight-grad accumulations) are batched across heads
    into wide dots — same trick as the forward kernel; only the
    block-diagonal score-space dots (s, dp, dv, dq, dk) stay per-head.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, n, d = x.shape
    na, _, da = p.wq.shape
    nh = h1 - h0
    scale = 1.0 / float(np.sqrt(da))
    mask_arr = None if mask is None else jnp.asarray(mask[None], jnp.bool_)
    row = lambda a: jnp.asarray(a).reshape(1, -1)

    def kernel(*refs):
        if mask_arr is not None:
            (x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref,
             proj_ref, bias_ref, m_ref, dy_ref, dwqkv_ref,
             dproj_ref, dbias_ref) = refs
        else:
            (x_ref, g_ref, lns_ref, lnb_ref, wqkv_ref,
             proj_ref, bias_ref, dy_ref, dwqkv_ref,
             dproj_ref, dbias_ref) = refs
        io_dt = x_ref.dtype

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
            dproj_ref[...] = jnp.zeros_like(dproj_ref)
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        xf = x_ref[0].astype(jnp.float32)
        y = _ln_fwd_f32(xf, lns_ref[...].astype(jnp.float32),
                        lnb_ref[...].astype(jnp.float32))[0].astype(io_dt)
        dacc = g_ref[0]  # (n, d), io dtype

        qkv = jnp.dot(y, wqkv_ref[...],
                      preferred_element_type=jnp.float32).astype(io_dt)
        do_all = jax.lax.dot_general(  # dacc @ proj^T, all heads at once
            dacc, proj_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(io_dt)  # (n, nh*da)

        os, dqs, dks, dvs = [], [], [], []
        for a in range(nh):
            q_io = qkv[:, a * da:(a + 1) * da]
            k_io = qkv[:, (nh + a) * da:(nh + a + 1) * da]
            v_io = qkv[:, (2 * nh + a) * da:(2 * nh + a + 1) * da]
            s = jax.lax.dot_general(
                q_io, k_io, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + bias_ref[a].astype(jnp.float32)
            if mask_arr is not None:
                s = jnp.where(m_ref[0], jnp.float32(-1e4), s)
            prob = jax.nn.softmax(s, axis=-1)  # (n, n) fp32
            p_io = prob.astype(io_dt)

            # o_a recompute for dproj
            o = jnp.dot(p_io, v_io, preferred_element_type=jnp.float32)
            os.append(o.astype(io_dt))
            do = do_all[:, a * da:(a + 1) * da]

            dv = jax.lax.dot_general(  # p^T @ do
                p_io, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(  # do @ v^T
                do, v_io, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = prob * (dp - jnp.sum(dp * prob, axis=-1, keepdims=True))
            if mask_arr is not None:
                ds = jnp.where(m_ref[0], jnp.float32(0.0), ds)
            dbias_ref[a] += ds
            ds_io = ds.astype(io_dt)
            dq = jnp.dot(ds_io, k_io,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(  # ds^T @ q
                ds_io, q_io, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dqs.append(dq.astype(io_dt))
            dks.append(dk.astype(io_dt))
            dvs.append(dv.astype(io_dt))

        # wide weight-grad / dy dots over the concatenated head columns
        o_all = jnp.concatenate(os, axis=1)  # (n, nh*da)
        dproj_ref[...] += jax.lax.dot_general(  # o^T @ dacc
            o_all, dacc, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=1)  # (n, 3*nh*da)
        dwqkv_ref[...] += jax.lax.dot_general(  # y^T @ dqkv
            y, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = jax.lax.dot_general(  # dq wq^T + dk wk^T + dv wv^T, one dot
            dqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy_ref[0] = dy.astype(dy_ref.dtype)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [tile, tile, const((1, d)), const((1, d)),
                const((d, 3 * nh * da)),
                const((nh * da, d)), const((nh, n, n))]
    args = [x, dx2, row(p.ln_scale), row(p.ln_bias),
            _wqkv_flat(p.wq[h0:h1], p.wk[h0:h1], p.wv[h0:h1]),
            p.proj[h0 * da:h1 * da], bias[h0:h1]]
    if mask_arr is not None:
        in_specs.append(const((1, n, n)))
        args.append(mask_arr)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[tile, const((d, 3 * nh * da)),
                   const((nh * da, d)), const((nh, n, n))],
        # dy partial in the io dtype: halves 2 x (nb, n, d) of HBM traffic
        # per layer; the fp32-accumulated per-head sums round once on store
        # (exact for fp32 io, bf16-noise-level in training)
        out_shape=[jax.ShapeDtypeStruct((nb, n, d), x.dtype),
                   jax.ShapeDtypeStruct((d, 3 * nh * da), jnp.float32),
                   jax.ShapeDtypeStruct((nh * da, d), jnp.float32),
                   jax.ShapeDtypeStruct((nh, n, n), jnp.float32)],
        interpret=interpret,
    )(*args)


def _unflat_dwqkv(dwqkv, nh: int, da: int):
    """Invert _wqkv_flat on a (d, 3*nh*da) grad: -> dwq/dwk/dwv (nh, d, da)."""
    d = dwqkv.shape[0]
    parts = dwqkv.reshape(d, 3, nh, da).transpose(1, 2, 0, 3)
    return parts[0], parts[1], parts[2]


def _xla_layer(tok, p, bias, mask, use_pallas):
    from .attention import ffn_tokens, mha_tokens

    return ffn_tokens(mha_tokens(tok, p, bias, mask, use_pallas=use_pallas),
                      p)


# test hook: route every pallas_call through the interpreter and the XLA
# attention core so the full custom_vjp composes on CPU
_FORCE_INTERPRET = False


@lru_cache(maxsize=8)
def _fused_layer_ad(masked: bool):
    """custom_vjp: Pallas fused forward (also emitting the post-attention
    residual x2); backward = fused Pallas FFN-half kernel from the saved
    x2, then the XLA vjp of the attention half (whose inner attention
    fwd/bwd are the existing fused Pallas kernels) recomputed from the
    inputs — remat semantics, callers skip jax.checkpoint."""
    from .attention import causal_mask, mha_tokens

    def _mask(n):
        return causal_mask(n) if masked else None

    @jax.custom_vjp
    def f(tok, p, bias):
        # no-grad forward (eval, the sampler's per-slice encoder pass):
        # single-output variant — the unused x2 would cost an (nb, n, d)
        # HBM write per layer that XLA cannot DCE through the custom call
        return fused_layer_tokens_pallas(
            tok, p, bias, _mask(tok.shape[1]), with_x2=False,
            interpret=_FORCE_INTERPRET)

    def fwd(tok, p, bias):
        out, x2 = fused_layer_tokens_pallas(
            tok, p, bias, _mask(tok.shape[1]), with_x2=True,
            interpret=_FORCE_INTERPRET)
        return out, (tok, x2, p, bias)

    def bwd(res, g):
        tok, x2, p, bias = res
        dx2, dw1, db1, dw2, db2, dls2, dlb2 = ffn_half_bwd_pallas(
            x2, g, p, interpret=_FORCE_INTERPRET)
        na = p.wq.shape[0]
        dx2_io = dx2.astype(g.dtype)
        if na % 2 == 0:
            # fused attention-half backward, split over two head groups
            # (each call's accumulator set fits v5e VMEM)
            half = na // 2
            mask = _mask(tok.shape[1])
            o0 = attn_half_bwd_pallas(tok, dx2_io, p, bias, mask, 0, half,
                                      interpret=_FORCE_INTERPRET)
            o1 = attn_half_bwd_pallas(tok, dx2_io, p, bias, mask, half, na,
                                      interpret=_FORCE_INTERPRET)
            dy = o0[0].astype(jnp.float32) + o1[0].astype(jnp.float32)
            dt = p.wq.dtype
            da = p.wq.shape[2]
            dwq0, dwk0, dwv0 = _unflat_dwqkv(o0[1], half, da)
            dwq1, dwk1, dwv1 = _unflat_dwqkv(o1[1], na - half, da)
            dwq = jnp.concatenate([dwq0, dwq1]).astype(dt)
            dwk = jnp.concatenate([dwk0, dwk1]).astype(dt)
            dwv = jnp.concatenate([dwv0, dwv1]).astype(dt)
            dproj = jnp.concatenate([o0[2], o1[2]]).astype(p.proj.dtype)
            dbias = jnp.concatenate([o0[3], o1[3]]).astype(bias.dtype)

            # LN backward over the summed dy + the residual path (XLA —
            # one elementwise fusion; same shared LN helpers, rows folded
            # over (nb*n, d))
            nb_, n_, d_ = tok.shape
            gam = p.ln_scale.astype(jnp.float32).reshape(1, d_)
            _, yhat, r = _ln_fwd_f32(
                tok.astype(jnp.float32).reshape(-1, d_), gam,
                jnp.float32(0.0))
            dls_row, dlb_row, dtok_ln = _ln_bwd_f32(
                dy.reshape(-1, d_), yhat, r, gam)
            dls1 = dls_row[0].astype(p.ln_scale.dtype)
            dlb1 = dlb_row[0].astype(p.ln_bias.dtype)
            dtok = (dtok_ln.reshape(nb_, n_, d_)
                    + dx2.astype(jnp.float32)).astype(tok.dtype)
            dp = p._replace(
                ln_scale=dls1, ln_bias=dlb1, wq=dwq, wk=dwk, wv=dwv,
                proj=dproj, ffn_w1=dw1, ffn_b1=db1, ffn_w2=dw2, ffn_b2=db2,
                ffn_ln_scale=dls2, ffn_ln_bias=dlb2,
                dt_bank=jnp.zeros_like(p.dt_bank),
                dh_bank=jnp.zeros_like(p.dh_bank),
                dw_bank=jnp.zeros_like(p.dw_bank))
            return dtok, dp, dbias

        # odd head counts: XLA vjp of the attention half
        use_pallas = False if _FORCE_INTERPRET else None
        _, vjp = jax.vjp(
            lambda t_, p_, b_: mha_tokens(t_, p_, b_, _mask(tok.shape[1]),
                                          use_pallas=use_pallas),
            tok, p, bias)
        dtok, dp_attn, dbias = vjp(dx2_io)
        dp = dp_attn._replace(ffn_w1=dw1, ffn_b1=db1, ffn_w2=dw2,
                              ffn_b2=db2, ffn_ln_scale=dls2,
                              ffn_ln_bias=dlb2)
        return dtok, dp, dbias

    f.defvjp(fwd, bwd)
    return f


def fused_block_layer(tok, p, bias, masked: bool):
    """Differentiable fused layer on token blocks (nb, n, d)."""
    return _fused_layer_ad(bool(masked))(tok, p, bias)


def _attn_bwd_vmem_bytes(na: int, d: int, da: int, n: int) -> int:
    """Upper-bound estimate of attn_half_bwd_pallas' per-call VMEM working
    set (nh = na//2 heads per call). Terms, fp32 unless noted:
    bias input + dbias accumulator (nh, n, n) each; ~4 live (n, n) score
    buffers (s/prob/dp/ds) + 2 io-dtype copies; dwqkv+dproj fp32
    accumulators; wqkv+proj operands; qkv/dqkv/o_all io activations; x/g/dy
    (n, d) tiles with double-buffer headroom. Validated against measured
    geometries: DSFVT na=8/n=256/d=512 -> ~11 MiB (compiles), na=8/n=512 ->
    ~22 MiB (would not)."""
    nh = max(na // 2, 1)
    score = 8 * nh * n * n + 16 * n * n + 4 * n * n
    accs = 16 * d * nh * da
    weights = 8 * d * nh * da
    acts = 6 * 2 * n * nh * da
    tiles = 3 * 4 * n * d
    return score + accs + weights + acts + tiles


def fused_layer_supported(layers, blocks) -> bool:
    """Geometry gate: one shared block size, shared head shape, da lane-
    aligned, a forward block volume Mosaic handles (the (na, n, n) bias +
    per-head score scratch stay inside VMEM), AND — when the even-head
    fused backward would run — a backward working set that fits v5e VMEM
    (the backward's accumulator+scratch set is ~2.5x the forward's; gating
    only the forward approved geometries whose first train step failed
    Mosaic compilation)."""
    if len(set(map(tuple, blocks))) != 1:
        return False
    shapes = {tuple(l.wq.shape) for l in layers}
    if len(shapes) != 1:
        return False
    na, d, da = next(iter(shapes))
    t, h, w = blocks[0]
    n = t * h * w
    if not (da % 128 == 0 and d % 128 == 0 and n <= 1024
            and na * n * n * 4 <= 8 * 2 ** 20):
        return False
    if na % 2 == 0 and _attn_bwd_vmem_bytes(na, d, da, n) > 13 * 2 ** 20:
        return False  # odd na falls back to the XLA attention-half vjp
    return True
