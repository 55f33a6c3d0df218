"""Whole-layer fused Pallas kernel (ops/fused_layer.py) vs the unfused XLA
layer. Forward compared in interpret mode; the backward IS the XLA vjp by
construction (custom_vjp recompute), so gradient correctness reduces to the
already-tested attention/FFN vjps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.ops import attention as attn
from lvt_tpu.ops import fused_layer as fl


def _layer_params(rng, na, d, da, block):
    t, h, w = block
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return attn.BlockAttnParams(
        ln_scale=1.0 + r(d), ln_bias=r(d),
        wq=r(na, d, da), wk=r(na, d, da), wv=r(na, d, da),
        proj=r(na * da, d),
        ffn_ln_scale=1.0 + r(d), ffn_ln_bias=r(d),
        ffn_w1=r(d, d), ffn_b1=r(d), ffn_w2=r(d, d), ffn_b2=r(d),
        dt_bank=r(na, 2 * t - 1), dh_bank=r(na, 2 * h - 1),
        dw_bank=r(na, 2 * w - 1))


@pytest.mark.parametrize("masked", [False, True])
def test_fused_layer_matches_xla_layer(rng, masked):
    na, d, da = 2, 32, 16
    block = (1, 4, 4)
    n = 16
    nb = 3
    p = _layer_params(rng, na, d, da, block)
    tok = jnp.asarray(rng.standard_normal((nb, n, d)), jnp.float32)
    bias = attn.relative_bias(p.dt_bank, p.dh_bank, p.dw_bank, block)
    mask = attn.causal_mask(n) if masked else None

    want = fl._xla_layer(tok, p, bias, mask, use_pallas=False)
    got = fl.fused_layer_tokens_pallas(tok, p, bias, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_layer_bf16(rng):
    na, d, da = 2, 32, 16
    block = (1, 4, 4)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), _layer_params(rng, na, d, da, block))
    tok = jnp.asarray(rng.standard_normal((2, 16, d)), jnp.bfloat16)
    bias = attn.relative_bias(p.dt_bank, p.dh_bank, p.dw_bank, block)
    got = fl.fused_layer_tokens_pallas(tok, p, bias, attn.causal_mask(16),
                                       interpret=True)
    want = fl._xla_layer(tok, p, bias, attn.causal_mask(16), use_pallas=False)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0.15)


def test_ffn_half_bwd_matches_xla_vjp(rng):
    """The fused FFN-half backward kernel == jax.vjp of ffn_tokens."""
    na, d, da = 2, 32, 16
    block = (1, 4, 4)
    p = _layer_params(rng, na, d, da, block)
    x2 = jnp.asarray(rng.standard_normal((3, 16, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((3, 16, d)), jnp.float32)

    _, vjp = jax.vjp(lambda x_, p_: attn.ffn_tokens(x_, p_), x2, p)
    want_dx, want_dp = vjp(g)
    dx2, dw1, db1, dw2, db2, dls, dlb = fl.ffn_half_bwd_pallas(
        x2, g, p, interpret=True)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(want_dx),
                               rtol=2e-4, atol=2e-4)
    for got, want, name in [(dw1, want_dp.ffn_w1, "dw1"),
                            (db1, want_dp.ffn_b1, "db1"),
                            (dw2, want_dp.ffn_w2, "dw2"),
                            (db2, want_dp.ffn_b2, "db2"),
                            (dls, want_dp.ffn_ln_scale, "dls"),
                            (dlb, want_dp.ffn_ln_bias, "dlb")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("masked,na", [
    (False, 2), (True, 2),
    # multi-head halves + the odd-head fallback: slow tier (each gradient
    # comparison walks the full custom_vjp twice)
    pytest.param(True, 4, marks=pytest.mark.slow),
    pytest.param(True, 3, marks=pytest.mark.slow)])
def test_fused_layer_grads_match_xla_layer(rng, masked, na):
    """End-to-end custom_vjp (fused fwd + FFN-half kernel + split
    attention-half kernels) vs autodiff through the unfused XLA layer.
    na=4 exercises multi-head halves in attn_half_bwd_pallas; na=3
    exercises the odd-head fallback (XLA attention-half vjp + FFN-grad
    splice), which no shipped config reaches."""
    d, da = 32, 16
    block = (1, 4, 4)
    n = 16
    p = _layer_params(rng, na, d, da, block)
    tok = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    bias = attn.relative_bias(p.dt_bank, p.dh_bank, p.dw_bank, block)
    mask = attn.causal_mask(n) if masked else None

    def loss_ref(t, pp, b):
        return jnp.sum(fl._xla_layer(t, pp, b, mask, use_pallas=False) ** 2)

    want, wgrads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(tok, p, bias)

    fl._FORCE_INTERPRET = True
    fl._fused_layer_ad.cache_clear()
    try:
        def loss_fused(t, pp, b):
            return jnp.sum(fl.fused_block_layer(t, pp, b, masked) ** 2)

        got, ggrads = jax.value_and_grad(
            loss_fused, argnums=(0, 1, 2))(tok, p, bias)
    finally:
        fl._FORCE_INTERPRET = False
        fl._fused_layer_ad.cache_clear()

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(ggrads),
            jax.tree_util.tree_leaves(wgrads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fused_layer_supported_gate():
    class L:
        def __init__(self, shape):
            self.wq = np.zeros(shape)

    layers = [L((8, 512, 128))] * 2
    assert fl.fused_layer_supported(layers, [(1, 16, 16)] * 2)       # DSFVT
    assert fl.fused_layer_supported(layers, [(4, 8, 8)] * 2)         # DSSVT
    assert not fl.fused_layer_supported(layers, [(1, 16, 16), (4, 8, 8)])
    assert not fl.fused_layer_supported([L((8, 512, 64))] * 2,
                                        [(1, 16, 16)] * 2)           # da 64
    # mixed head shapes
    assert not fl.fused_layer_supported([L((8, 512, 128)), L((4, 512, 128))],
                                        [(1, 16, 16)] * 2)
    # n=512 at na=8: the FORWARD bias bound (8 MiB) passes but the
    # attention-half BACKWARD working set (~22-25 MiB estimated) cannot
    # compile on v5e — the gate must bound the backward too
    assert not fl.fused_layer_supported(layers, [(2, 16, 16)] * 2)


def test_fused_flag_is_inert_on_cpu(rng):
    """TPU.FUSED_LAYER=True on the CPU backend must fall back to the XLA
    path (same guard semantics as use_pallas)."""
    from lvt_tpu.config import get_cfg
    from lvt_tpu.models.vt import VideoTransformer

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 2, 8
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.SHARE_P = False
    cfg.TPU.FUSED_LAYER = True
    m = VideoTransformer(cfg, T=4, H=4, W=4)
    assert m.fused
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(rng.integers(0, 8, (2, 2, 4, 4, 4)), jnp.int32)
    loss, _ = m.loss(params, {"video": video}, jax.random.key(1))
    assert np.isfinite(float(loss))
