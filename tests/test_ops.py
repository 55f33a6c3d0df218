"""Op-level parity tests: convs vs torch, gather-conv vs dense one-hot conv,
causal conv causality, positional encoding vs the reference arithmetic,
block-local attention vs a torch oracle, Pallas kernels vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lvt_tpu.ops import attention as attn
from lvt_tpu.ops import conv as lconv
from lvt_tpu.ops import posenc


# --------------------------------------------------------------------------
# 2D convs vs torch
# --------------------------------------------------------------------------

def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)  # NCHW for torch
    w = rng.standard_normal((8, 3, 4, 4)).astype(np.float32)  # OIHW
    b = rng.standard_normal((8,)).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=2, padding=1).numpy()
    got = lconv.conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
        jnp.asarray(b), stride=2, padding=1,
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_conv_transpose2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    w = rng.standard_normal((8, 5, 4, 4)).astype(np.float32)  # torch: (in, out, kh, kw)
    b = rng.standard_normal((5,)).astype(np.float32)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                             stride=2, padding=1).numpy()
    got = lconv.conv_transpose2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),  # (in,out,kh,kw) -> (kh,kw,out,in)
        jnp.asarray(b), stride=2, padding=1,
    )
    assert got.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4)


# --------------------------------------------------------------------------
# Causal 3D conv
# --------------------------------------------------------------------------

def _torch_masked_conv3d(x, w, b, kernel):
    """Oracle reproducing the reference MaskedConv3d data path
    (vt_utils.py:183-200): pad (front/top/centered), zero future taps."""
    kt, kh, kw = kernel
    wm = w.clone()
    wm[:, :, -1, -1, kw // 2 :] = 0
    xp = F.pad(x, [kw // 2, kw // 2, kh - 1, 0, kt - 1, 0])
    return F.conv3d(xp, wm, b)


def test_masked_conv3d_matches_torch(rng):
    kt, kh, kw = 3, 3, 3
    x = rng.standard_normal((2, 6, 1, 4, 5)).astype(np.float32)  # N C T H W
    w = rng.standard_normal((7, 6, kt, kh, kw)).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)
    ref = _torch_masked_conv3d(torch.from_numpy(x), torch.from_numpy(w),
                               torch.from_numpy(b), (kt, kh, kw)).numpy()
    got = lconv.masked_conv3d(
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # NCTHW -> NTHWC
        jnp.asarray(w.transpose(2, 3, 4, 1, 0)),  # OIDHW -> DHWIO
        jnp.asarray(b),
    )
    assert got.shape == (2, 1, 4, 5, 7)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), ref, atol=1e-4)


def test_masked_conv3d_is_raster_causal(rng):
    """Changing input at raster position p must not affect outputs < p, and
    must not affect the output at p itself (strictly-past receptive field)."""
    t, h, w, c = 2, 4, 4, 3
    x = rng.standard_normal((1, t, h, w, c)).astype(np.float32)
    wgt = rng.standard_normal((3, 3, 3, c, 5)).astype(np.float32)
    y0 = np.asarray(lconv.masked_conv3d(jnp.asarray(x), jnp.asarray(wgt)))

    flat = lambda a: a.reshape(1, t * h * w, -1)
    for p in [0, 5, 17, t * h * w - 1]:
        x2 = x.copy().reshape(1, t * h * w, c)
        x2[0, p] += 100.0
        y2 = np.asarray(lconv.masked_conv3d(jnp.asarray(x2.reshape(1, t, h, w, c)), jnp.asarray(wgt)))
        np.testing.assert_array_equal(flat(y2)[0, : p + 1], flat(y0)[0, : p + 1])


# --------------------------------------------------------------------------
# Gather-based one-hot conv
# --------------------------------------------------------------------------

@pytest.mark.parametrize("stride,kernel", [((16, 1, 1), (7, 1, 1)), ((4, 2, 2), (5, 3, 3))])
def test_subscale_context_encode_equals_dense_onehot_conv(rng, stride, kernel):
    nc, nv, de = 2, 8, 16
    st, sh, sw = stride
    kt, kh, kw = kernel
    T, H, W = 16, 8, 8
    t, h, w = T // st, H // sh, W // sw
    Tp, Hp, Wp = kt + (t - 1) * st, kh + (h - 1) * sh, kw + (w - 1) * sw

    ctx = rng.integers(-1, nv, size=(2, nc, Tp, Hp, Wp)).astype(np.int32)
    table = rng.standard_normal((nc, kt, kh, kw, nv, de)).astype(np.float32)
    bias = rng.standard_normal((de,)).astype(np.float32)

    got = lconv.subscale_context_encode(jnp.asarray(ctx), jnp.asarray(table),
                                        jnp.asarray(bias), stride, nv)

    # dense formulation: one-hot (pad rows all-zero) then VALID strided conv
    oh = np.zeros((2, Tp, Hp, Wp, nc * nv), np.float32)
    for b in range(2):
        for c in range(nc):
            for i in range(Tp):
                for j in range(Hp):
                    for k in range(Wp):
                        v = ctx[b, c, i, j, k]
                        if v >= 0:
                            oh[b, i, j, k, c * nv + v] = 1.0
    wdense = np.asarray(lconv.onehot_table_to_conv_weight(jnp.asarray(table)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(oh), jnp.asarray(wdense), window_strides=stride,
        padding=[(0, 0)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


# --------------------------------------------------------------------------
# Positional encoding vs reference arithmetic
# --------------------------------------------------------------------------

def test_posenc_matches_reference_arithmetic():
    """Oracle re-derives vt_attention.py:25-49: per-axis sin/cos bands padded
    into the channel dim, accumulated in-place."""
    t, h, w, d = 2, 3, 4, 32
    x = np.zeros((1, t, h, w, d), np.float32)
    got = np.asarray(posenc.add_positional_encoding(jnp.asarray(x)))

    nts = d // 6
    inv = 1.0 * np.exp(np.arange(nts) * -(np.log(1e4) / nts))
    want = np.zeros((t, h, w, d), np.float32)
    for dim, length in enumerate((t, h, w)):
        pos = np.arange(length, dtype=np.float32)
        scaled = pos[:, None] * inv[None, :]
        sig = np.concatenate([np.sin(scaled), np.cos(scaled)], 1)  # (len, 2nts)
        pre = dim * 2 * nts
        band = np.zeros((length, d), np.float32)
        band[:, pre : pre + 2 * nts] = sig
        shape = [1, 1, 1, d]
        shape[dim] = length
        want += band.reshape(shape)
    np.testing.assert_allclose(got[0], want, atol=1e-5)


# --------------------------------------------------------------------------
# Block-local attention vs torch oracle
# --------------------------------------------------------------------------

def _torch_block_attention(x, p: attn.BlockAttnParams, block_size, masked):
    """Oracle built from the reference equations (vt_attention.py:52-202)
    with torch ops, consuming our parameter layout."""
    xt = torch.from_numpy(np.asarray(x, np.float32))  # (b, T, H, W, d)
    b, T, H, W, d = xt.shape
    t, h, w = block_size
    na = np.asarray(p.wq).shape[0]
    da = np.asarray(p.wq).shape[2]
    thw = t * h * w

    # partition into contiguous blocks
    xt = xt.reshape(b, T // t, t, H // h, h, W // w, w, d)
    xt = xt.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, thw, d)

    ln = lambda v, s, bb: F.layer_norm(v, (d,), torch.from_numpy(np.asarray(s)), torch.from_numpy(np.asarray(bb)))
    y = ln(xt, p.ln_scale, p.ln_bias)
    wq, wk, wv = (torch.from_numpy(np.asarray(a)) for a in (p.wq, p.wk, p.wv))
    q = torch.einsum("bnd,adk->abnk", y, wq)
    k = torch.einsum("bnd,adk->abnk", y, wk)
    v = torch.einsum("bnd,adk->abnk", y, wv)
    scores = q @ k.transpose(2, 3) / np.sqrt(da)

    B = np.asarray(attn.relative_bias(p.dt_bank, p.dh_bank, p.dw_bank, tuple(block_size)))
    scores = scores + torch.from_numpy(B)[:, None]
    if masked:
        m = torch.from_numpy(attn.causal_mask(thw).copy())
        scores = scores.masked_fill(m, -1e4)
    a_ = torch.softmax(scores, dim=-1)
    out = (a_ @ v).permute(1, 2, 0, 3).reshape(-1, thw, na * da)
    out = out @ torch.from_numpy(np.asarray(p.proj))
    xt = out + xt
    y = ln(xt, p.ffn_ln_scale, p.ffn_ln_bias)
    y = torch.relu(y @ torch.from_numpy(np.asarray(p.ffn_w1)) + torch.from_numpy(np.asarray(p.ffn_b1)))
    y = y @ torch.from_numpy(np.asarray(p.ffn_w2)) + torch.from_numpy(np.asarray(p.ffn_b2))
    xt = y + xt

    xt = xt.reshape(b, T // t, H // h, W // w, t, h, w, d)
    xt = xt.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, T, H, W, d)
    return xt.numpy()


@pytest.mark.parametrize("block,THW,masked", [
    ((1, 4, 4), (1, 4, 4), True),    # full-slice block (DSFVT-like)
    ((2, 2, 2), (4, 4, 4), False),   # multi-block (DSSVT-like)
    ((2, 2, 2), (4, 4, 4), True),
])
def test_block_local_attention_matches_torch_oracle(rng, block, THW, masked):
    d, na, da = 16, 2, 8
    key = jax.random.key(0)
    p = attn.init_block_attn(key, block, na, d, da)
    # randomize banks so the bias path is exercised
    t, h, w = block
    p = p._replace(
        dt_bank=jnp.asarray(rng.standard_normal((na, 2 * t - 1)).astype(np.float32)),
        dh_bank=jnp.asarray(rng.standard_normal((na, 2 * h - 1)).astype(np.float32)),
        dw_bank=jnp.asarray(rng.standard_normal((na, 2 * w - 1)).astype(np.float32)),
    )
    x = rng.standard_normal((2, *THW, d)).astype(np.float32)
    got = np.asarray(attn.block_local_attention(jnp.asarray(x), p, block, masked, use_pallas=False))
    want = _torch_block_attention(x, p, block, masked)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_attention_core_pallas_matches_xla(rng):
    nb, na, n, da = 4, 2, 16, 8
    q, k, v = (rng.standard_normal((nb, na, n, da)).astype(np.float32) for _ in range(3))
    bias = rng.standard_normal((na, n, n)).astype(np.float32)
    mask = attn.causal_mask(n)
    ref = np.asarray(attn.attention_core_xla(*map(jnp.asarray, (q, k, v, bias)), mask))
    got = np.asarray(attn.attention_core_pallas(*map(jnp.asarray, (q, k, v, bias)), mask, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # unmasked path
    ref = np.asarray(attn.attention_core_xla(*map(jnp.asarray, (q, k, v, bias)), None))
    got = np.asarray(attn.attention_core_pallas(*map(jnp.asarray, (q, k, v, bias)), None, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_masked_attention_is_causal(rng):
    """Token i's output must not depend on tokens > i under the causal mask."""
    block = (1, 4, 4)
    d, na, da = 8, 2, 4
    p = attn.init_block_attn(jax.random.key(1), block, na, d, da)
    x = rng.standard_normal((1, 1, 4, 4, d)).astype(np.float32)
    y0 = np.asarray(attn.block_local_attention(jnp.asarray(x), p, block, True, use_pallas=False))
    xf = x.reshape(1, 16, d).copy()
    xf[0, 10] += 50.0
    y1 = np.asarray(attn.block_local_attention(
        jnp.asarray(xf.reshape(1, 1, 4, 4, d)), p, block, True, use_pallas=False))
    np.testing.assert_allclose(
        y1.reshape(1, 16, d)[0, :10], y0.reshape(1, 16, d)[0, :10], atol=1e-5)
    assert not np.allclose(y1.reshape(1, 16, d)[0, 10], y0.reshape(1, 16, d)[0, 10])


@pytest.mark.parametrize("masked", [True, False])
def test_attention_pallas_backward_matches_xla_vjp(rng, masked):
    """The fused Pallas backward (dq, dk, dv, dbias) must equal the XLA
    formulation's vjp (the previous backward path)."""
    nb, na, n, da = 3, 2, 16, 8
    q, k, v = (jnp.asarray(rng.standard_normal((nb, na, n, da)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((na, n, n)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((nb, na, n, da)), jnp.float32)
    mask = attn.causal_mask(n) if masked else None

    _, vjp = jax.vjp(lambda q_, k_, v_, b_: attn.attention_core_xla(
        q_, k_, v_, b_, mask), q, k, v, bias)
    want = vjp(g)
    got = attn.attention_core_pallas_bwd(q, k, v, bias, g, mask, interpret=True)
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=name)


def test_attention_pallas_backward_bf16_io(rng):
    """bf16 q/k/v/bias (the training dtypes): grads come back in the input
    dtypes with fp32 internals."""
    nb, na, n, da = 2, 2, 16, 8
    q, k, v = (jnp.asarray(rng.standard_normal((nb, na, n, da)), jnp.bfloat16)
               for _ in range(3))
    bias = jnp.asarray(rng.standard_normal((na, n, n)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((nb, na, n, da)), jnp.bfloat16)
    dq, dk, dv, dbias = attn.attention_core_pallas_bwd(
        q, k, v, bias, g, None, interpret=True)
    assert dq.dtype == dk.dtype == dv.dtype == jnp.bfloat16
    assert dbias.dtype == jnp.bfloat16
    _, vjp = jax.vjp(lambda *args: attn.attention_core_xla(*args, None),
                     q, k, v, bias)
    want = vjp(g)
    np.testing.assert_allclose(np.asarray(dq, np.float32),
                               np.asarray(want[0], np.float32), atol=0.05)


@pytest.mark.parametrize("stride,kernel,extra", [
    ((4, 1, 1), (3, 1, 1), 0),
    ((1, 2, 2), (1, 3, 3), 0),
    # even kernel + 1 extra padded row: (Tp - kt) % st != 0, so the old
    # backward's kernel-size reconstruction kt = Tp - (t-1)*st was wrong
    ((2, 1, 1), (4, 1, 1), 1),
])
def test_ctx_encode_custom_backward_matches_gather_vjp(rng, stride, kernel,
                                                       extra):
    """The one-hot-matmul d(table) must equal the natural gather vjp."""
    from lvt_tpu.ops import conv as C

    nc, nv, de = 2, 6, 8
    kt, kh, kw = kernel
    st, sh, sw = stride
    t, h, w = 2, 4, 4
    Tp, Hp, Wp = (t - 1) * st + kt + extra, (h - 1) * sh + kh, (w - 1) * sw + kw
    t = (Tp - kt) // st + 1  # valid-window count actually produced
    table = jnp.asarray(rng.standard_normal((nc, kt, kh, kw, nv, de)),
                        jnp.float32)
    ctx = jnp.asarray(
        rng.integers(-1, nv, size=(3, nc, Tp, Hp, Wp)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((3, t, h, w, de)), jnp.float32)

    def loss_custom(tab):
        return jnp.vdot(C._ctx_encode(ctx, tab, stride, nv, kernel), g)

    def loss_natural(tab):
        return jnp.vdot(C._ctx_encode_impl(ctx, tab, stride), g)

    np.testing.assert_allclose(loss_custom(table), loss_natural(table),
                               rtol=1e-6)
    got = jax.grad(loss_custom)(table)
    want = jax.grad(loss_natural)(table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("impl", ["chain", "minor", "onehot", "chunk"])
def test_ctx_encode_impl_variants_bit_match(rng, impl, monkeypatch):
    """Every LVT_CTX_IMPL formulation (perf knobs for the 36%-of-roofline
    ctx-table gather, NOTES_r3 tail accounting) must reproduce the default
    gather_sum bit-for-bit — same rows summed in a different op order is
    only exact because each table row enters the sum exactly once."""
    from lvt_tpu.ops import conv as C

    nc, nv, de = 2, 6, 8
    stride, kernel = (4, 1, 1), (3, 1, 1)
    t, h, w = 2, 4, 4
    Tp, Hp, Wp = (t - 1) * 4 + 3, h, w
    table = jnp.asarray(rng.standard_normal((nc, 3, 1, 1, nv, de)),
                        jnp.float32)
    ctx = jnp.asarray(
        rng.integers(-1, nv, size=(3, nc, Tp, Hp, Wp)), jnp.int32)
    want = np.asarray(C._ctx_encode_impl(ctx, table, stride))
    monkeypatch.setenv("LVT_CTX_IMPL", impl)
    if impl == "chunk":
        # force multiple chunks so the chunk-boundary adds are exercised
        monkeypatch.setenv("LVT_CTX_CHUNK", "2")
    got = np.asarray(C._ctx_encode_impl(ctx, table, stride))
    if impl == "chunk":
        # chunk sums within each chunk BEFORE adding to the accumulator:
        # ((a+b)+(c+d)) vs (((a+b)+c)+d) — same rows, different fp add
        # tree, so equality holds only to the last ulp
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_array_equal(got, want)


def test_take_rows_backward_matches_gather_vjp(rng):
    """ops.embedding.take_rows: forward == jnp.take; d(table) from the
    one-hot matmul == the natural scatter-add vjp, including grad flow
    through a sliced view of a larger parameter (the predictor U_w case)."""
    from lvt_tpu.ops.embedding import take_rows

    V, de = 7, 8
    table = jnp.asarray(rng.standard_normal((V, de)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, size=(3, 5, 4)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((3, 5, 4, de)), jnp.float32)

    np.testing.assert_array_equal(np.asarray(take_rows(table, idx)),
                                  np.asarray(jnp.take(table, idx, axis=0)))

    def loss_custom(tab):
        return jnp.vdot(take_rows(tab, idx), g)

    def loss_natural(tab):
        return jnp.vdot(jnp.take(tab, idx, axis=0), g)

    got = jax.grad(loss_custom)(table)
    want = jax.grad(loss_natural)(table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # through a slice of a bigger parameter (predictor U_w lower block)
    big = jnp.asarray(rng.standard_normal((V + 4, de)), jnp.float32)
    got2 = jax.grad(lambda b: jnp.vdot(take_rows(b[4:], idx), g))(big)
    want2 = jax.grad(lambda b: jnp.vdot(jnp.take(b[4:], idx, axis=0), g))(big)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_attention_core_custom_vjp_glue_composes(rng, masked):
    """Exercise the COMPOSED _attention_core_pallas_ad custom_vjp (residual
    plumbing, gate dispatch, grad-tuple order) in interpret mode against
    XLA autodiff — the kernels were tested individually but the defvjp glue
    only ever ran on hardware before."""
    from lvt_tpu.ops import attention as attn

    na, n, da = 2, 16, 8
    q = jnp.asarray(rng.standard_normal((3, na, n, da)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, na, n, da)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, na, n, da)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((na, n, n)), jnp.float32)
    mask = attn.causal_mask(n) if masked else None

    def loss_ref(q, k, v, b):
        return jnp.sum(attn.attention_core_xla(q, k, v, b, mask) ** 2)

    want, wg = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)

    attn._FORCE_INTERPRET = True
    attn._attention_core_pallas_ad.cache_clear()
    try:
        def loss_pallas(q, k, v, b):
            return jnp.sum(attn.attention_core(
                q, k, v, b, mask, use_pallas=True) ** 2)

        got, gg = jax.value_and_grad(
            loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    finally:
        attn._FORCE_INTERPRET = False
        attn._attention_core_pallas_ad.cache_clear()

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for a, b_, nm in zip(gg, wg, "qkvb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4, err_msg=nm)


def test_attention_core_rejects_noncausal_mask(rng):
    from lvt_tpu.ops import attention as attn

    na, n, da = 2, 8, 4
    q = jnp.asarray(rng.standard_normal((1, na, n, da)), jnp.float32)
    bias = jnp.zeros((na, n, n), jnp.float32)
    bad = np.zeros((n, n), bool)
    bad[0, -1] = True  # not the causal triangle
    with pytest.raises(AssertionError, match="causal"):
        attn.attention_core(q, q, q, bias, bad, use_pallas=True)
