"""Block-local multi-head attention with decomposed relative position bias.

TPU-native rebuild of the reference attention stack
(vidgen/modeling/autoregressive/vt_attention.py:52-202):

* the (T, H, W) grid is partitioned into contiguous ``block_size`` tiles and
  full attention runs inside each tile — static shapes, so every block maps
  onto one MXU-friendly batched matmul;
* per-head additive bias B = Bt + Bh + Bw gathered from learned delta banks
  (vt_attention.py:142-174);
* causal masking (when ``masked``) fills with -1e4 *after* adding B, exactly
  like the reference's masked_fill (vt_attention.py:73);
* pre-LN heads, concat-proj residual, then a LN-Linear-ReLU-Linear FFN with
  its own residual (vt_attention.py:114-129, 138).

Layout is channels-last (b, T, H, W, d) throughout. A Pallas kernel fuses
QK^T + bias + mask + softmax + PV per block so the (thw, thw) attention
matrix never leaves VMEM; the XLA path is the CPU/test reference.
"""

from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name


# --------------------------------------------------------------------------
# Static geometry helpers
# --------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _delta_indices(block_size: Tuple[int, int, int]):
    """Flattened per-axis delta index arrays (thw*thw,) used to gather the
    relative-bias banks; values in [0, 2*axis-2]."""
    t, h, w = block_size
    tt = np.arange(t).repeat(h * w)
    hh = np.tile(np.arange(h).repeat(w), t)
    ww = np.tile(np.arange(w), t * h)
    dt = tt[:, None] - tt[None, :] + (t - 1)
    dh = hh[:, None] - hh[None, :] + (h - 1)
    dw = ww[:, None] - ww[None, :] + (w - 1)
    return dt.astype(np.int32), dh.astype(np.int32), dw.astype(np.int32)


@lru_cache(maxsize=64)
def causal_mask(n: int) -> np.ndarray:
    """(n, n) bool, True above the diagonal = masked (reference triu mask,
    vt_attention.py:162-167)."""
    return np.triu(np.ones((n, n), dtype=bool), k=1)


@lru_cache(maxsize=64)
def _bias_rel_table(block_size: Tuple[int, int, int]):
    """Concatenated-bank relative index table: (3, thw*thw) int32 indices
    into [dt_bank | dh_bank | dw_bank] laid side by side (width K)."""
    t, h, w = block_size
    dt, dh, dw = _delta_indices(block_size)
    rel = np.stack([dt.reshape(-1),
                    dh.reshape(-1) + (2 * t - 1),
                    dw.reshape(-1) + (2 * t - 1) + (2 * h - 1)])
    K = (2 * t - 1) + (2 * h - 1) + (2 * w - 1)
    return rel.astype(np.int32), K


def relative_bias(dt_bank, dh_bank, dw_bank, block_size) -> jnp.ndarray:
    """Banks (na, 2s-1) -> bias (na, thw, thw) (reference get_B,
    vt_attention.py:169-174).

    Computed as ONE matmul against a static 0/1 membership matrix instead of
    three gathers: the gather's transpose is a scatter-add of thw^2 values
    into ~2s buckets per head per layer — all-colliding indices that XLA
    serializes on TPU (measured: the bias backward alone cost as much as the
    whole rest of the backward). The matmul's transpose is a matmul.
    """
    t, h, w = block_size
    thw = t * h * w
    rel, K = _bias_rel_table(tuple(block_size))
    bank = jnp.concatenate([dt_bank, dh_bank, dw_bank], axis=1)  # (na, K)
    # membership: M[k, ij] = 1 where any axis maps pair ij to bank column k
    # (axis ranges are disjoint, so entries are 0/1); built on device from
    # the small index table, loop-invariant -> hoisted out of layer scans
    M = (jnp.asarray(rel)[:, :, None] ==
         jnp.arange(K, dtype=jnp.int32)[None, None, :]).any(0)
    return (bank @ M.astype(bank.dtype).T).reshape(-1, thw, thw)


def split_blocks(x: jnp.ndarray, block_size) -> Tuple[jnp.ndarray, Tuple]:
    """(b, T, H, W, d) -> (b * nb, thw, d) with contiguous tiles.

    Matches the reference's split/stack partition (vt_attention.py:190-194):
    block index runs (bt, bh, bw) row-major per batch element.
    """
    b, T, H, W, d = x.shape
    t, h, w = block_size
    nbt, nbh, nbw = T // t, H // h, W // w
    x = x.reshape(b, nbt, t, nbh, h, nbw, w, d)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # b, nbt, nbh, nbw, t, h, w, d
    return x.reshape(b * nbt * nbh * nbw, t * h * w, d), (b, nbt, nbh, nbw, t, h, w, d)


def merge_blocks(x: jnp.ndarray, geom) -> jnp.ndarray:
    b, nbt, nbh, nbw, t, h, w, d = geom
    x = x.reshape(b, nbt, nbh, nbw, t, h, w, d)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, nbt * t, nbh * h, nbw * w, d)


# --------------------------------------------------------------------------
# Attention core: softmax(q k^T / sqrt(da) + B [+ mask]) v
# --------------------------------------------------------------------------

def attention_core_xla(q, k, v, bias, mask: Optional[np.ndarray]) -> jnp.ndarray:
    """q, k, v: (nb, na, n, da); bias: (na, n, n); mask: (n, n) bool or None."""
    da = q.shape[-1]
    attn = jnp.einsum("bani,bami->banm", q.astype(jnp.float32), k.astype(jnp.float32)) / np.sqrt(da)
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        attn = jnp.where(jnp.asarray(mask)[None, None], jnp.float32(-1e4), attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("banm,bamd->band", attn, v.astype(jnp.float32))
    return out.astype(q.dtype)


def attention_core_pallas(q, k, v, bias, mask: Optional[np.ndarray], *, interpret=False) -> jnp.ndarray:
    """Fused per-block attention. Grid over blocks; the (na, n, n) attention
    matrix lives only in VMEM. n is thw (<= 1024 for all shipped configs), so
    one block's working set is tiny relative to the ~16 MB VMEM budget."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, na, n, da = q.shape
    scale = 1.0 / float(np.sqrt(da))
    mask_arr = None if mask is None else jnp.asarray(mask[None], jnp.bool_)  # (1, n, n)

    def kernel(*refs):
        if mask_arr is not None:
            q_ref, k_ref, v_ref, b_ref, m_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        for a in range(na):  # static unroll over heads
            # dots run in the INPUT dtype with fp32 accumulation: bf16
            # inputs hit the MXU at full rate (fp32 operands run at 1/4);
            # bf16 x bf16 products are exact in the fp32 accumulator, so
            # QK^T is bit-identical to upcasting first
            qa = q_ref[0, a]  # (n, da)
            ka = k_ref[0, a]
            va = v_ref[0, a]
            attn = jax.lax.dot_general(
                qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            attn = attn + b_ref[a].astype(jnp.float32)
            if mask_arr is not None:
                attn = jnp.where(m_ref[0], jnp.float32(-1e4), attn)
            attn = jax.nn.softmax(attn, axis=-1)
            # PV in the value dtype (softmax weights rounded to it — the
            # same precision the KV-cached sampler uses for this product)
            o_ref[0, a] = jnp.dot(
                attn.astype(va.dtype), va, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, na, n, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, na, n, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, na, n, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((na, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias]
    if mask_arr is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM))
        args.append(mask_arr)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, na, n, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, na, n, da), q.dtype),
        interpret=interpret,
    )(*args)


def attention_core_pallas_bwd(q, k, v, bias, g, mask: Optional[np.ndarray],
                              *, interpret=False):
    """Fused recompute-backward (flash-attention recipe): one program per
    (head, block) recomputes the (n, n) softmax in VMEM and emits
    dq/dk/dv/dbias — no HBM round-trip for the score matrix (the XLA
    backward materializes it in fp32 several times; measured as the
    dominant cost of the train step's backward).

    dbias is accumulated across the batch-block grid dimension by revisiting
    the same output block (TPU grid iteration is sequential)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, na, n, da = q.shape
    scale = 1.0 / float(np.sqrt(da))
    mask_arr = None if mask is None else jnp.asarray(mask[None], jnp.bool_)

    def kernel(*refs):
        if mask_arr is not None:
            q_ref, k_ref, v_ref, b_ref, g_ref, m_ref, dq_ref, dk_ref, dv_ref, db_ref = refs
        else:
            q_ref, k_ref, v_ref, b_ref, g_ref, dq_ref, dk_ref, dv_ref, db_ref = refs

        @pl.when(pl.program_id(0) == 0)
        def _init():
            db_ref[...] = jnp.zeros_like(db_ref)

        for a in range(na):  # static unroll over heads (matches the forward)
            # input-dtype operands, fp32 accumulation (see forward kernel):
            # bf16 runs the MXU at full rate; softmax/ds stay fp32
            qa = q_ref[0, a]  # (n, da)
            ka = k_ref[0, a]
            va = v_ref[0, a]
            ga = g_ref[0, a]
            io_dt = qa.dtype

            s = jax.lax.dot_general(
                qa, ka, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + b_ref[a].astype(jnp.float32)
            if mask_arr is not None:
                s = jnp.where(m_ref[0], jnp.float32(-1e4), s)
            p = jax.nn.softmax(s, axis=-1)  # (n, n) fp32

            p_io = p.astype(io_dt)
            dv = jax.lax.dot_general(  # p^T @ g
                p_io, ga, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(  # g @ v^T
                ga, va, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # fp32
            if mask_arr is not None:
                ds = jnp.where(m_ref[0], jnp.float32(0.0), ds)

            ds_io = ds.astype(io_dt)
            dq = jnp.dot(ds_io, ka, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(  # ds^T @ q
                ds_io, qa, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            dq_ref[0, a] = dq.astype(dq_ref.dtype)
            dk_ref[0, a] = dk.astype(dk_ref.dtype)
            dv_ref[0, a] = dv.astype(dv_ref.dtype)
            db_ref[a] += ds  # fp32 accumulator over the batch-block grid

    qkv_spec = pl.BlockSpec((1, na, n, da), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((na, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec]
    args = [q, k, v, bias, g]
    if mask_arr is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask_arr)

    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=(nb,),  # dbias revisits its block every iteration: accumulate
        in_specs=in_specs,
        out_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_shape=[jax.ShapeDtypeStruct((nb, na, n, da), q.dtype),
                   jax.ShapeDtypeStruct((nb, na, n, da), k.dtype),
                   jax.ShapeDtypeStruct((nb, na, n, da), v.dtype),
                   jax.ShapeDtypeStruct((na, n, n), jnp.float32)],
        interpret=interpret,
    )(*args)
    return dq, dk, dv, dbias.astype(bias.dtype)


# the fused backward's VMEM working set per program is dominated by the
# (na, n, n) fp32 dbias accumulator + (na, n, n) bias block + ~4 n^2 fp32
# scratch — gate on na * n^2 (not n alone: 8 heads at n=512 would blow the
# ~16 MB v5e VMEM). 2^21 elements ~= 12 MB of those buffers. Past the gate
# the XLA backward is used (shipped configs: na=8, n=256 -> 524k, fine).
_PALLAS_BWD_MAX_ELEMS = 2 ** 21


# test hook: route the composed custom_vjp's pallas_calls through the
# interpreter so the defvjp GLUE (residual order, grad-tuple order, gate
# dispatch) is exercised by the CPU suite, not just the kernels in isolation
_FORCE_INTERPRET = False


@lru_cache(maxsize=8)
def _attention_core_pallas_ad(masked: bool):
    """Differentiable wrapper: Pallas forward; backward via the fused Pallas
    recompute kernel. (The XLA-vjp branch below is defense-in-depth for
    direct callers only — attention_core falls back whole-hog at the same
    threshold, so it is unreachable through the public path.)"""

    def _mask(n):
        return causal_mask(n) if masked else None

    @jax.custom_vjp
    def f(q, k, v, bias):
        return attention_core_pallas(q, k, v, bias, _mask(q.shape[2]),
                                     interpret=_FORCE_INTERPRET)

    def fwd(q, k, v, bias):
        return f(q, k, v, bias), (q, k, v, bias)

    def bwd(res, g):
        q, k, v, bias = res
        na, n = q.shape[1], q.shape[2]
        if na * n * n < _PALLAS_BWD_MAX_ELEMS:  # strict: 2^21 exactly blows VMEM
            return attention_core_pallas_bwd(q, k, v, bias, g, _mask(n),
                                             interpret=_FORCE_INTERPRET)
        _, vjp = jax.vjp(
            lambda q_, k_, v_, b_: attention_core_xla(q_, k_, v_, b_, _mask(n)),
            q, k, v, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def attention_core(q, k, v, bias, mask, *, use_pallas: Optional[bool] = None):
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and q.shape[1] * q.shape[2] ** 2 >= _PALLAS_BWD_MAX_ELEMS:
        # same size gate as the backward, boundary-EXCLUSIVE (na=8, n=512
        # sits exactly on 2^21 and blows VMEM): the forward kernel pins the
        # full (na, n, n) fp32 bias in VMEM, so geometries past the gate
        # would fail Mosaic compilation in the forward while the backward
        # 'safely' fell back — fall back whole-hog instead
        use_pallas = False
    if use_pallas:
        # the only masks used are the causal triangle or none; the AD wrapper
        # reconstructs them from `masked` so the mask needn't be traced —
        # which is only sound if the mask IS the causal triangle
        masked = mask is not None
        if masked:
            assert mask.shape == (q.shape[2], q.shape[2])
            assert np.array_equal(mask, causal_mask(q.shape[2])), \
                "attention_core's Pallas path supports only the causal mask"
        return _attention_core_pallas_ad(masked)(q, k, v, bias)
    return attention_core_xla(q, k, v, bias, mask)


# --------------------------------------------------------------------------
# Full layer
# --------------------------------------------------------------------------

class BlockAttnParams(NamedTuple):
    """One BlockLocalAttention layer's parameters (see reference
    vt_attention.py:84-145 for shapes)."""

    ln_scale: jnp.ndarray  # (d,)
    ln_bias: jnp.ndarray  # (d,)
    wq: jnp.ndarray  # (na, d, da)
    wk: jnp.ndarray  # (na, d, da)
    wv: jnp.ndarray  # (na, d, da)
    proj: jnp.ndarray  # (na * da, d)   y = x @ proj (no bias)
    ffn_ln_scale: jnp.ndarray  # (d,)
    ffn_ln_bias: jnp.ndarray  # (d,)
    ffn_w1: jnp.ndarray  # (d, d)
    ffn_b1: jnp.ndarray  # (d,)
    ffn_w2: jnp.ndarray  # (d, d)
    ffn_b2: jnp.ndarray  # (d,)
    dt_bank: jnp.ndarray  # (na, 2t - 1)
    dh_bank: jnp.ndarray  # (na, 2h - 1)
    dw_bank: jnp.ndarray  # (na, 2w - 1)


def init_block_attn(key, block_size, na: int, d: int, da: int) -> BlockAttnParams:
    """Xavier-normal for head weights (reference init_weights,
    vt_attention.py:108-112); zero bias banks; xavier-uniform FFN (overridden
    by the model-level init there too)."""
    t, h, w = block_size
    ks = jax.random.split(key, 6)

    def xavier_normal(k, shape, fan_in, fan_out):
        std = float(np.sqrt(2.0 / (fan_in + fan_out)))
        return jax.random.normal(k, shape, jnp.float32) * std

    def xavier_uniform(k, shape, fan_in, fan_out):
        lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(k, shape, jnp.float32, -lim, lim)

    return BlockAttnParams(
        ln_scale=jnp.ones((d,)),
        ln_bias=jnp.zeros((d,)),
        # torch xavier_normal_ on (na, d, da) treats dims (d, da) with
        # receptive field na... parity of init statistics is not load-bearing;
        # checkpoint conversion overrides all values.
        wq=xavier_normal(ks[0], (na, d, da), d, da),
        wk=xavier_normal(ks[1], (na, d, da), d, da),
        wv=xavier_normal(ks[2], (na, d, da), d, da),
        proj=xavier_normal(ks[3], (na * da, d), na * da, d),
        ffn_ln_scale=jnp.ones((d,)),
        ffn_ln_bias=jnp.zeros((d,)),
        ffn_w1=xavier_uniform(ks[4], (d, d), d, d),
        ffn_b1=jnp.zeros((d,)),
        ffn_w2=xavier_uniform(ks[5], (d, d), d, d),
        ffn_b2=jnp.zeros((d,)),
        dt_bank=jnp.zeros((na, 2 * t - 1)),
        dh_bank=jnp.zeros((na, 2 * h - 1)),
        dw_bank=jnp.zeros((na, 2 * w - 1)),
    )


def _layer_norm(x, scale, bias, eps=1e-5):
    """THE LayerNorm for the whole VT stack (models/vt.py re-exports it):
    stats in fp32 — bf16 statistics destabilize LN, and a second private
    copy of this function drifting to bf16 stats once made the XLA
    fallback diverge from the fused Pallas path. Keep one definition."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def mha_tokens(x: jnp.ndarray, p: BlockAttnParams, bias: jnp.ndarray,
               mask: Optional[np.ndarray], *, use_pallas=None) -> jnp.ndarray:
    """Multi-head attention over token sequences x: (nb, n, d)."""
    nb, n, d = x.shape
    na, _, da = p.wq.shape
    residual = x
    y = _layer_norm(x, p.ln_scale, p.ln_bias)
    # NOTE: fusing q/k/v into one matmul via a weight concat was measured
    # SLOWER here (82 vs 72 ms/step): inside the stacked-layer scan the
    # concat re-materializes 3 weight banks per iteration, costing more HBM
    # traffic than the fused matmul saves. (The sampler fuses QKV because
    # its weights are concatenated ONCE outside the pixel scan.)
    # checkpoint_name: identity normally; under TPU.REMAT_POLICY='qkv' the
    # surrounding jax.checkpoint saves exactly these three (48 MB/layer at
    # DSFVT b64) so the backward's attention vjp doesn't replay LN+QKV —
    # measured ~0.45 ms/layer of recompute for ~0.15 ms of stash traffic
    q = checkpoint_name(jnp.einsum("bnd,adk->bank", y, p.wq), "qkv")
    k = checkpoint_name(jnp.einsum("bnd,adk->bank", y, p.wk), "qkv")
    v = checkpoint_name(jnp.einsum("bnd,adk->bank", y, p.wv), "qkv")
    out = attention_core(q, k, v, bias, mask, use_pallas=use_pallas)  # (nb, na, n, da)
    out = out.transpose(0, 2, 1, 3).reshape(nb, n, na * da)
    out = out @ p.proj
    return out + residual


def ffn_tokens(x: jnp.ndarray, p: BlockAttnParams) -> jnp.ndarray:
    y = _layer_norm(x, p.ffn_ln_scale, p.ffn_ln_bias)
    y = jax.nn.relu(y @ p.ffn_w1 + p.ffn_b1)
    y = y @ p.ffn_w2 + p.ffn_b2
    return y + x


def block_local_attention(x: jnp.ndarray, p: BlockAttnParams, block_size,
                          masked: bool, *, use_pallas=None) -> jnp.ndarray:
    """One full BlockLocalAttention layer on (b, T, H, W, d)."""
    t, h, w = block_size
    bias = relative_bias(p.dt_bank, p.dh_bank, p.dw_bank, tuple(block_size))
    mask = causal_mask(t * h * w) if masked else None
    tokens, geom = split_blocks(x, block_size)
    tokens = mha_tokens(tokens, p, bias, mask, use_pallas=use_pallas)
    tokens = ffn_tokens(tokens, p)
    return merge_blocks(tokens, geom)
