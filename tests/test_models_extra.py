"""Coverage for the less-traveled model variants: VQVAE2 two-level nets,
ConvEncoder/ConvDecoder/ResShuffleDecoder forwards vs torch, spectral norm,
share_p / share_embeddings predictor heads, UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from lvt_tpu.config import get_cfg
from lvt_tpu.models.decoders import build_generator
from lvt_tpu.models.encoders import build_encoder


def _cfg(enc="ConvEncoder", gen="ConvDecoder"):
    cfg = get_cfg()
    cfg.MODEL.ENCODER.NAME = enc
    cfg.MODEL.ENCODER.IN_CHANNELS = 3
    cfg.MODEL.ENCODER.NF = 8
    cfg.MODEL.ENCODER.RES_CHANNELS = 4
    cfg.MODEL.ENCODER.OUT_CHANNELS = 8
    cfg.MODEL.ENCODER.N_LAYERS = 2
    cfg.MODEL.GENERATOR.NAME = gen
    cfg.MODEL.GENERATOR.IN_CHANNELS = 8
    cfg.MODEL.GENERATOR.NF = 8
    cfg.MODEL.GENERATOR.RES_CHANNELS = 4
    cfg.MODEL.GENERATOR.OUT_CHANNELS = 3
    cfg.MODEL.GENERATOR.N_LAYERS = 2
    cfg.MODEL.CODEBOOK.DIM = 8
    return cfg


@pytest.mark.slow  # full-size config walk; construction covered by test_configs_build
def test_conv_encoder_decoder_shapes(rng):
    cfg = _cfg()
    enc = build_encoder(cfg)
    dec = build_generator(cfg)
    pe, se = enc.init(jax.random.key(0))
    pg, sg = dec.init(jax.random.key(1))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    z, _ = enc.apply(pe, se, x)
    # ConvEncoder: n_layers=2 -> two AvgPool2 downsamples
    assert z.shape == (2, 4, 4, 8)
    y, _ = dec.apply(pg, sg, z)
    # ConvDecoder upsamples back by 2^n_layers
    assert y.shape == (2, 16, 16, 3)


def test_res_shuffle_decoder_matches_torch_pixelshuffle(rng):
    """PixelShuffle channel ordering must match torch exactly."""
    from lvt_tpu.models.layers2d import _pixel_shuffle

    x = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    got = np.asarray(_pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.mark.slow
def test_vqvae2_encoder_decoder(rng):
    cfg = _cfg(enc="VQVAE2Encoder", gen="VQVAE2Decoder")
    enc = build_encoder(cfg)
    dec = build_generator(cfg)
    pe, se = enc.init(jax.random.key(0))
    pg, sg = dec.init(jax.random.key(1))
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    eb, se = enc.apply(pe, se, x, "enc_b")
    assert eb.shape == (1, 8, 8, 8)  # stride 4
    et, se = enc.apply(pe, se, eb, "enc_t")
    assert et.shape == (1, 4, 4, 8)  # stride 2
    qt, se = enc.apply(pe, se, et, "quantize_conv_t")
    assert qt.shape == (1, 4, 4, 8)  # embed_dim = CODEBOOK.DIM = 8
    dt, se = enc.apply(pe, se, qt, "dec_t")
    assert dt.shape == (1, 8, 8, 8)
    qb_in = jnp.concatenate([dt, eb], axis=-1)
    qb, se = enc.apply(pe, se, qb_in, "quantize_conv_b")
    assert qb.shape == (1, 8, 8, 8)
    y, _ = dec.apply(pg, sg, qt, qb)
    assert y.shape == (1, 32, 32, 3)


def test_spectral_norm_bounds_weight(rng):
    """Spectral-normalized conv weight should have near-unit top singular
    value after a few power iterations."""
    from lvt_tpu.models.encoders import SeqNet

    spec = (("conv", 4, 8, 3, 1, 1),)
    net = SeqNet(spec, "", True, "xavier_uniform")
    p, s = net.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    for _ in range(20):  # power-iteration warmup
        _, s = net.apply(p, s, x, train=True)
    from lvt_tpu.models.layers2d import _spectral_normalize

    w_sn, _ = _spectral_normalize(p[0]["w"], s[0]["u"], train=False)
    sv = np.linalg.svd(np.asarray(w_sn).reshape(-1, 8), compute_uv=False)
    np.testing.assert_allclose(sv[0], 1.0, atol=0.05)


def test_share_p_and_share_embeddings_heads(rng):
    from lvt_tpu.models.vt import VTConfig, init_vt_params, vt_logits

    base = dict(nc=2, nv=8, kernel=(3, 1, 1), stride=(4, 1, 1), d=16, da=8,
                de=8, blocks_e=((1, 4, 4),), n_head_e=(2,),
                blocks_d=((1, 4, 4),), n_head_d=(2,), n_prime=1, pad_value=-1,
                class_num=0)
    ctx = jnp.asarray(rng.integers(-1, 8, size=(1, 2, 3, 4, 4)), jnp.int32)
    sl = jnp.asarray(rng.integers(0, 8, size=(1, 2, 1, 4, 4)), jnp.int32)
    sidx = jnp.asarray([1], jnp.int32)

    for share_p, share_emb in [(True, False), (False, True), (False, False)]:
        c = VTConfig(share_p=share_p, share_embeddings=share_emb, **base)
        params = init_vt_params(jax.random.key(0), c)
        if share_p or share_emb:
            assert not isinstance(params["predictor"]["P_w"], list)
        lg = vt_logits(params, c, ctx, sl, sidx, use_pallas=False)
        assert lg.shape == (1, 1, 4, 4, 2, 8)
        assert np.isfinite(np.asarray(lg)).all()


def test_unet_registered_and_runs(rng):
    cfg = get_cfg()
    cfg.MODEL.ENCODER.NAME = "UNet"
    cfg.MODEL.ENCODER.OUT_CHANNELS = 2
    import lvt_tpu.models.unet  # noqa: F401 — ensures registration

    net = build_encoder(cfg)
    p, s = net.init(jax.random.key(0))
    codes = jnp.asarray(rng.integers(0, 512, size=(1, 16, 16)))
    y, _ = net.apply(p, s, codes)
    assert y.shape == (1, 16, 16, 2)
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_spectral_norm_convT_mismatched_channels(rng):
    """Spectral norm on a transposed conv with cin != cout: the u vector
    lives on the OUT channels (torch dim=1 for ConvTranspose2d); the old
    reshape assumed out = last dim (true only for plain convs) and
    shape-errored here."""
    from lvt_tpu.models.encoders import SeqNet
    from lvt_tpu.models.layers2d import _spectral_normalize

    spec = (("convT", 8, 4, 4, 2, 1),)  # cin=8 -> cout=4
    net = SeqNet(spec, "", True, "xavier_uniform")
    p, s = net.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
    for _ in range(20):
        y, s = net.apply(p, s, x, train=True)
    assert y.shape == (2, 16, 16, 4)
    w_sn, _ = _spectral_normalize(p[0]["w"], s[0]["u"], train=False, out_axis=2)
    # rows = out channels, like torch's (out, -1) view
    wm = np.moveaxis(np.asarray(w_sn), 2, -1).reshape(-1, 4)
    sv = np.linalg.svd(wm, compute_uv=False)
    np.testing.assert_allclose(sv[0], 1.0, atol=0.05)


def test_unet_bilinear_up2_matches_torch_align_corners(rng):
    import torch
    import torch.nn.functional as F

    from lvt_tpu.models.unet import _bilinear_up2

    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(_bilinear_up2(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=2, mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_frozen_bn_params_get_no_gradient(rng):
    from lvt_tpu.models.norms import apply_norm, init_norm

    p, s = init_norm("FrozenBN", 4)
    x = jnp.asarray(rng.standard_normal((2, 3, 3, 4)).astype(np.float32))

    def loss(p):
        y, _ = apply_norm("FrozenBN", p, s, x, train=True)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(p)
    assert float(jnp.abs(g["scale"]).max()) == 0.0
    assert float(jnp.abs(g["bias"]).max()) == 0.0


def test_instance_and_std_norms_match_torch_and_are_paramless(rng):
    """IN/StdN/StdNV2 parity (reference batch_norm.py:125-145, 235-251):
    the reference factory builds nn.InstanceNorm2d with its affine=False
    default and StdNorm2d defines no parameters — so these norms must carry
    NO learnable params here, and their math must match torch. StdN uses
    torch's default UNBIASED spatial variance. (Documented, not replicated:
    get_norm('StdN', ch) upstream accidentally binds eps=ch — we keep the
    class default 1e-5.)"""
    import torch
    import torch.nn as nn

    from lvt_tpu.models.norms import apply_norm, init_norm

    x = rng.standard_normal((2, 5, 7, 6)).astype(np.float32)  # NHWC
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW

    for name in ("IN", "StdN", "StdNV2"):
        p, s = init_norm(name, 6)
        assert p == {} and s == {}, f"{name} must be parameterless"

    got_in, _ = apply_norm("IN", {}, {}, jnp.asarray(x), train=True)
    want_in = nn.InstanceNorm2d(6)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got_in), want_in,
                               rtol=1e-5, atol=1e-5)

    got_std, _ = apply_norm("StdN", {}, {}, jnp.asarray(x), train=True)
    want_std = (xt / (xt.var(dim=(2, 3), keepdim=True) + 1e-5).sqrt())
    want_std = want_std.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got_std), want_std,
                               rtol=1e-5, atol=1e-5)

    got_v2, _ = apply_norm("StdNV2", {}, {}, jnp.asarray(x), train=True)
    want_v2 = xt * torch.rsqrt(torch.mean(xt ** 2, dim=(2, 3), keepdim=True)
                               + 1e-8)
    want_v2 = want_v2.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got_v2), want_v2,
                               rtol=1e-5, atol=1e-5)


def test_bn_running_stats_match_torch(rng):
    """torch BatchNorm2d normalizes with the BIASED batch variance but
    updates running_var with the UNBIASED one (n/(n-1)) — one train-mode
    forward must reproduce both the output and the updated running stats."""
    import torch
    import torch.nn as nn

    from lvt_tpu.models.norms import apply_norm, init_norm

    x = rng.standard_normal((4, 5, 3, 6)).astype(np.float32)
    p, s = init_norm("BN", 6)

    bn = nn.BatchNorm2d(6, momentum=0.1)
    bn.train()
    want_y = bn(torch.from_numpy(x).permute(0, 3, 1, 2))
    want_y = want_y.permute(0, 2, 3, 1).detach().numpy()

    got_y, ns = apply_norm("BN", p, s, jnp.asarray(x), train=True,
                           momentum=0.1)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns["mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns["var"]),
                               bn.running_var.numpy(), rtol=1e-5, atol=1e-6,
                               err_msg="running_var must use the UNBIASED "
                                       "batch variance (torch semantics)")
