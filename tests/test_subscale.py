"""Property tests for the subscale index machinery.

Ports the reference's inline tests (vt_utils.py:17-21, 36-45, 60-72, 131-158)
and adds equivalence tests between the mask-based formulation and our static
gather maps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.ops import subscale as ss


def test_subscale_order_bijection():
    idx2abc, abc2idx = ss.subscale_order(4, 2, 2)
    assert len(idx2abc) == 16 == len(abc2idx)
    assert sorted(abc2idx.values()) == list(range(16))
    for i, abc in enumerate(idx2abc):
        assert abc2idx[abc] == i


def test_slice_mask_cardinality():
    T, H, W = 4, 4, 4
    st, sh, sw = 1, 2, 2
    m = ss.slice_mask_np(0, 1, 1, st, sh, sw, T, H, W)
    assert m.sum() == (T // st) * (H // sh) * (W // sw)


def test_visible_mask_cardinality():
    T, H, W = 4, 4, 4
    st, sh, sw = 2, 2, 1
    a, b, c = 1, 0, 0
    m = ss.visible_abc_mask_np(a, b, c, st, sh, sw, T, H, W)
    _, abc2idx = ss.subscale_order(st, sh, sw)
    t, h, w = T // st, H // sh, W // sw
    assert m.sum() == t * h * w * abc2idx[(a, b, c)]


def test_slices_partition_video():
    """All slices together tile the video exactly once."""
    T, H, W = 8, 4, 6
    st, sh, sw = 4, 2, 3
    total = np.zeros((T, H, W), dtype=int)
    for a in range(st):
        for b in range(sh):
            for c in range(sw):
                total += ss.slice_mask_np(a, b, c, st, sh, sw, T, H, W)
    assert (total == 1).all()


def test_shifted_shape_constant_across_slices():
    T, H, W = 16, 16, 16
    st, sh, sw = 16, 1, 1
    kt, kh, kw = 7, 1, 1
    shp = ss.shifted_shape(st, sh, sw, T, H, W, kt, kh, kw)
    for a in range(st):
        x = np.zeros((1, T, H, W))
        y = ss.ss_shift_np(x, a, 0, 0, st, sh, sw, kt, kh, kw)
        assert y.shape[1:] == shp


@pytest.mark.parametrize(
    "stride,kernel,THW",
    [((16, 1, 1), (7, 1, 1), (16, 16, 16)),   # DSFVT
     ((1, 2, 2), (1, 3, 3), (16, 16, 16)),    # DSSVT
     ((4, 2, 2), (5, 3, 3), (16, 16, 16)),    # DSTSVT
     ((5, 4, 10), (3, 3, 3), (20, 20, 20))],  # reference test_ss_conv geometry
)
def test_ss_shift_conv_centering(stride, kernel, THW):
    """The shifted grid is positioned so conv application i lands centered on
    slice element i: conv output of identity-center kernel == slice values."""
    st, sh, sw = stride
    kt, kh, kw = kernel
    T, H, W = THW
    rng = np.random.default_rng(1)
    x = rng.standard_normal((T, H, W))
    for (a, b, c) in ss.subscale_order(st, sh, sw)[0]:
        shifted = ss.ss_shift_np(x, a, b, c, st, sh, sw, kt, kh, kw, pad_value=0.0)
        # center-tap extraction == strided center sampling
        centers = shifted[kt // 2 :: st, kh // 2 :: sh, kw // 2 :: sw]
        t, h, w = T // st, H // sh, W // sw
        centers = centers[:t, :h, :w]
        np.testing.assert_allclose(centers, x[a::st, b::sh, c::sw])


def test_plan_context_matches_mask_formulation():
    """Static gather map == masked_fill + ss_shift (the reference data path)."""
    st, sh, sw = 4, 2, 2
    kt, kh, kw = 5, 3, 3
    T, H, W = 8, 8, 8
    pad = -1
    plan = ss.build_plan(st, sh, sw, T, H, W, kt, kh, kw)
    rng = np.random.default_rng(2)
    video = rng.integers(0, 512, size=(2, 4, T, H, W))

    idx2abc, _ = ss.subscale_order(st, sh, sw)
    vflat = jnp.asarray(video.reshape(2, 4, -1))
    for s, (a, b, c) in enumerate(idx2abc):
        got = np.asarray(ss.gather_context(vflat, jnp.asarray(plan.ctx_src[s]), pad))
        vis = ss.visible_abc_mask_np(a, b, c, st, sh, sw, T, H, W)
        ref = np.where(vis, video, pad)
        ref = ss.ss_shift_np(ref, a, b, c, st, sh, sw, kt, kh, kw, pad_value=pad)
        np.testing.assert_array_equal(got, ref)


def test_plan_slice_gather_scatter_roundtrip():
    st, sh, sw = 2, 2, 2
    T, H, W = 4, 4, 4
    plan = ss.build_plan(st, sh, sw, T, H, W, 3, 3, 3)
    rng = np.random.default_rng(3)
    video = jnp.asarray(rng.integers(0, 99, size=(1, 2, T * H * W)))
    for s, (a, b, c) in enumerate(ss.subscale_order(st, sh, sw)[0]):
        sl = ss.gather_slice(video, jnp.asarray(plan.slice_src[s]))
        ref = np.asarray(video).reshape(1, 2, T, H, W)[:, :, a::st, b::sh, c::sw]
        np.testing.assert_array_equal(np.asarray(sl), ref)
        # scatter back is identity
        video2 = ss.scatter_slice(video, jnp.asarray(plan.slice_src[s]), sl)
        np.testing.assert_array_equal(np.asarray(video2), np.asarray(video))


def test_frame_decomposition_matches_generic_gather(rng):
    """For frame-granular geometries (sh=sw=1, kh=kw=1) the plan exposes
    ctx_frame_src and the frame-row gather must equal the generic
    per-element gather_context for every slice."""
    import jax.numpy as jnp

    from lvt_tpu.ops import subscale as ss

    T, H, W = 8, 4, 4
    plan = ss.build_plan(4, 1, 1, T, H, W, 3, 1, 1)  # DSFVT-like
    assert plan.ctx_frame_src is not None
    assert plan.ctx_frame_src.shape == (4, plan.ctx_shape[0])

    video = jnp.asarray(
        rng.integers(0, 9, size=(2, 3, T * H * W)), jnp.int32)
    v4 = video.reshape(2, 3, T, H * W)
    for s in range(plan.num_slices):
        want = ss.gather_context(video, jnp.asarray(plan.ctx_src[s]), -1)
        got = ss.gather_context_frames(
            v4, jnp.asarray(plan.ctx_frame_src[s]), -1)
        np.testing.assert_array_equal(
            np.asarray(got).reshape(want.shape), np.asarray(want))
    # batched per-sample form
    sidx = jnp.asarray([1, 3])
    got_b = ss.gather_context_frames(
        v4, jnp.asarray(plan.ctx_frame_src)[sidx], -1)
    for i, s in enumerate([1, 3]):
        want = ss.gather_context(video[i], jnp.asarray(plan.ctx_src[s]), -1)
        np.testing.assert_array_equal(
            np.asarray(got_b[i]).reshape(want.shape), np.asarray(want))

    # spatial-subscale geometry cannot frame-decompose
    plan2 = ss.build_plan(1, 2, 2, 4, 4, 4, 1, 3, 3)
    assert plan2.ctx_frame_src is None
