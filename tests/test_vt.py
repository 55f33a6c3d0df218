"""Video Transformer tests: shapes on a shrunken DSFVT-style config, loss,
causality of the teacher-forced logits, whole-video logits scatter, sampling
semantics (priming respected, values in range, determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.config import get_cfg
from lvt_tpu.models.vt import VideoTransformer, VTConfig, vt_logits


def _tiny_cfg(stride=(4, 1, 1), kernel=(3, 1, 1), blocks=((1, 4, 4),) * 2,
              n_prime=1):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC = 2
    v.NV = 8
    v.KERNEL = kernel
    v.STRIDE = stride
    v.D = 32
    v.DA = 16
    v.DE = 16
    v.BLOCKS_E = blocks
    v.N_HEAD_E = (2,) * len(blocks)
    v.BLOCKS_D = blocks
    v.N_HEAD_D = (2,) * len(blocks)
    v.N_PRIME = n_prime
    v.SHARE_P = False
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    return cfg


@pytest.fixture
def tiny_model():
    cfg = _tiny_cfg()
    return VideoTransformer(cfg, T=4, H=4, W=4)


def _rand_video(rng, b, model):
    return jnp.asarray(
        rng.integers(0, model.c.nv, size=(b, model.c.nc, model.T, model.H, model.W)),
        jnp.int32)


def test_loss_runs_and_is_finite(rng, tiny_model):
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    batch = {"video": _rand_video(rng, 3, m)}
    loss, aux = m.loss(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert "loss_cross_entropy" in aux


def test_loss_grads_nonzero(rng, tiny_model):
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    batch = {"video": _rand_video(rng, 2, m)}
    g = jax.grad(lambda p: m.loss(p, batch, jax.random.key(1))[0])(params)
    total = jax.tree_util.tree_reduce(lambda a, l: a + float(jnp.abs(l).sum()), g, 0.0)
    assert total > 0


def test_decoder_is_causal_through_predictor(rng, tiny_model):
    """Changing slice codes at raster position >= p must not change logits at
    positions < p (decoder conv + masked attention + predictor factorization)."""
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    b = 1
    video = _rand_video(rng, b, m)
    slice_idx = jnp.asarray([2], jnp.int32)
    ctx, sl, _ = m.prepare_slices(video, slice_idx)

    lg0 = np.asarray(vt_logits(params["netG"], m.c, ctx, sl, slice_idx, use_pallas=False))
    t, h, w = m.plan.slice_shape
    thw = t * h * w
    p = 7
    sl2 = np.asarray(sl).reshape(b, m.c.nc, thw).copy()
    sl2[:, :, p:] = (sl2[:, :, p:] + 3) % m.c.nv
    sl2 = jnp.asarray(sl2.reshape(sl.shape))
    lg1 = np.asarray(vt_logits(params["netG"], m.c, ctx, sl2, slice_idx, use_pallas=False))

    lg0f = lg0.reshape(b, thw, m.c.nc, m.c.nv)
    lg1f = lg1.reshape(b, thw, m.c.nc, m.c.nv)
    np.testing.assert_allclose(lg1f[:, :p], lg0f[:, :p], atol=1e-5)
    # and the changed suffix does affect its own logits for channel > 0
    assert not np.allclose(lg1f[:, p:], lg0f[:, p:], atol=1e-5)


def test_channel_factorization_is_causal(rng, tiny_model):
    """Channel k's logits depend only on channels < k at the same pixel."""
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    video = _rand_video(rng, 1, m)
    slice_idx = jnp.asarray([1], jnp.int32)
    ctx, sl, _ = m.prepare_slices(video, slice_idx)
    lg0 = np.asarray(vt_logits(params["netG"], m.c, ctx, sl, slice_idx, use_pallas=False))

    # change channel 1 at one pixel -> channel 0 logits at that pixel unchanged
    sl2 = np.asarray(sl).copy()
    sl2[0, 1, 0, 2, 2] = (sl2[0, 1, 0, 2, 2] + 1) % m.c.nv
    lg1 = np.asarray(vt_logits(params["netG"], m.c, ctx, jnp.asarray(sl2), slice_idx, use_pallas=False))
    np.testing.assert_allclose(lg1[0, 0, 2, 2, 0], lg0[0, 0, 2, 2, 0], atol=1e-5)


def test_logits_for_entire_video_covers_all_positions(rng, tiny_model):
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    video = _rand_video(rng, 2, m)
    lg = m.logits_for_entire_video(params, video)
    assert lg.shape == (2, m.T, m.H, m.W, m.c.nc, m.c.nv)
    # every position was written by some slice (zero-init would leave
    # all-zero logits rows only with probability ~0)
    assert float(jnp.abs(lg).sum(axis=(-1,)).min()) > 0


def test_sample_video_respects_priming_and_range(rng, tiny_model):
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    n_prime = 1
    video = _rand_video(rng, 2, m)
    out = m.sample_video(params, video, jax.random.key(5), n_prime=n_prime)
    out = np.asarray(out)
    vid = np.asarray(video)
    assert out.shape == vid.shape
    # primed frames untouched
    np.testing.assert_array_equal(out[:, :, :n_prime], vid[:, :, :n_prime])
    # sampled values in range
    assert out.min() >= 0 and out.max() < m.c.nv
    # sampling actually changed the future frames (w.h.p.)
    assert (out[:, :, n_prime:] != vid[:, :, n_prime:]).any()


def test_sample_video_deterministic_given_key(rng, tiny_model):
    m = tiny_model
    params, _ = m.init(jax.random.key(0))
    video = _rand_video(rng, 1, m)
    o1 = np.asarray(m.sample_video(params, video, jax.random.key(7)))
    o2 = np.asarray(m.sample_video(params, video, jax.random.key(7)))
    np.testing.assert_array_equal(o1, o2)
    o3 = np.asarray(m.sample_video(params, video, jax.random.key(8)))
    assert (o1 != o3).any()


def test_dssvt_style_geometry(rng):
    """Spatial-subscale geometry: stride (1,2,2), multi-block attention."""
    cfg = _tiny_cfg(stride=(1, 2, 2), kernel=(1, 3, 3), blocks=((2, 2, 2),) * 2)
    m = VideoTransformer(cfg, T=4, H=4, W=4)
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(rng.integers(0, m.c.nv, size=(1, m.c.nc, 4, 4, 4)), jnp.int32)
    loss, _ = m.loss(params, {"video": video}, jax.random.key(1))
    assert np.isfinite(float(loss))
    out = m.sample_video(params, video, jax.random.key(2), n_prime=1)
    assert out.shape == video.shape
    # frame 0 rows of every slice are primed: t-coordinate 0 belongs to frame 0
    np.testing.assert_array_equal(np.asarray(out)[:, :, 0], np.asarray(video)[:, :, 0])


def test_class_conditional_path(rng):
    cfg = _tiny_cfg()
    cfg.MODEL.AUTOREGRESSIVE.VT.CLASS_NUM = 5
    m = VideoTransformer(cfg, T=4, H=4, W=4)
    params, _ = m.init(jax.random.key(0))
    assert "class_embedding" in params["netG"]["encoder"]
    video = jnp.asarray(rng.integers(0, m.c.nv, size=(2, m.c.nc, 4, 4, 4)), jnp.int32)
    batch = {"video": video, "class": jnp.asarray([1, 3], jnp.int32)}
    loss, _ = m.loss(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    out = m.sample_video(params, video, jax.random.key(2),
                         class_idx=jnp.asarray([0, 4], jnp.int32))
    assert out.shape == video.shape


def test_remat_flag_preserves_loss_and_grads(rng):
    """TPU.REMAT trades memory for recompute — it must not change the math."""
    import jax

    from lvt_tpu.config import get_cfg
    from lvt_tpu.models.vt import VideoTransformer

    def build(remat, policy=""):
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
        cfg.TPU.REMAT = remat
        cfg.TPU.REMAT_POLICY = policy
        return VideoTransformer(cfg, T=4, H=4, W=4)

    m0 = build(False)
    params, _ = m0.init(jax.random.key(0))
    video = jnp.asarray(rng.integers(0, 8, size=(2, 2, 4, 4, 4)), jnp.int32)
    key = jax.random.key(3)

    def loss(m):
        return lambda p: m.loss(p, {"video": video}, key)[0]

    l0, g0 = jax.value_and_grad(loss(m0))(params)
    for m1 in (build(True), build(True, "dots"), build(True, "qkv")):
        l1, g1 = jax.value_and_grad(loss(m1))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # a typo'd policy must error, not silently degrade to full remat
    with pytest.raises(ValueError, match="REMAT_POLICY"):
        build(True, "dot")
