"""Exactness tests for the KV-cached incremental decoder: it must reproduce
the full-recompute (reference-formulation) sampler bit-for-bit in greedy mode
and match teacher-forced decoder activations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.config import get_cfg
from lvt_tpu.models.vt import VideoTransformer, vt_decode, vt_encode
from lvt_tpu.models import vt_incremental as vti
from lvt_tpu.ops import subscale as ssub


def _cfg(stride, kernel, blocks, nc=2, nv=8):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = nc, nv
    v.KERNEL, v.STRIDE = kernel, stride
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = blocks
    v.N_HEAD_E = (2,) * len(blocks)
    v.BLOCKS_D = blocks
    v.N_HEAD_D = (2,) * len(blocks)
    v.N_PRIME = 1
    v.SHARE_P = False
    return cfg


CASES = [
    # DSFVT-like: full-slice blocks, frame slices
    ((4, 1, 1), (3, 1, 1), ((1, 4, 4),) * 2, (4, 4, 4)),
    # DSSVT-like: spatial subscale, multi-block attention
    ((1, 2, 2), (1, 3, 3), ((2, 2, 2),) * 2, (4, 4, 4)),
    # DSTSVT-like
    ((2, 2, 2), (3, 3, 3), ((2, 2, 2),) * 2, (4, 4, 4)),
    # sub-spatial blocks (bh < h): blocks are NOT contiguous raster runs,
    # exercising the factored-bias fallback instead of block-local caches
    ((4, 1, 1), (3, 1, 1), ((1, 2, 2),) * 2, (4, 4, 4)),
    # NON-SQUARE spatial grid + asymmetric stride: h != w exercises every
    # index-arithmetic assumption (raster order, block runs, rel tables)
    # that square test grids cannot distinguish from their transpose
    ((1, 2, 1), (1, 3, 3), ((2, 2, 2),) * 2, (2, 4, 6)),
    # single-frame slices over a tall grid, block run < thw along W only
    ((2, 1, 2), (3, 1, 3), ((1, 4, 2),) * 2, (4, 4, 4)),
]


@pytest.mark.parametrize("stride,kernel,blocks,THW", CASES)
def test_incremental_equals_full_recompute_greedy(rng, stride, kernel, blocks, THW):
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)

    key = jax.random.key(11)
    full = m.sample_video(params, video, key, n_prime=1, incremental=False,
                          greedy=True)
    inc = m.sample_video(params, video, key, n_prime=1, incremental=True,
                         greedy=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(inc))


def test_incremental_matches_teacher_forced_activations(rng):
    """Force the incremental rollout through fixed target codes (prime all
    positions) and compare each pixel's decoder output against the
    teacher-forced vt_decode."""
    stride, kernel, blocks, THW = CASES[1]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(3))
    c = m.c
    t, h, w = m.plan.slice_shape
    thw = t * h * w

    video = jnp.asarray(rng.integers(0, c.nv, size=(1, c.nc, *THW)), jnp.int32)
    s = 2
    vflat = video.reshape(1, c.nc, -1)
    ctx = ssub.gather_context(vflat, jnp.asarray(m.plan.ctx_src[s]), c.pad_value)
    sl = ssub.gather_slice(vflat, jnp.asarray(m.plan.slice_src[s]))
    sidx = jnp.asarray([s], jnp.int32)
    zl = vt_encode(params["netG"], c, ctx, sidx, use_pallas=False)

    # all positions primed -> rollout must just reproduce activations of sl
    primed = jnp.ones((thw,), bool)
    out, _ = vti.sample_slice_incremental(
        params["netG"], c, (t, h, w), zl, sl, jax.random.key(0), primed, 1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sl))

    # teacher-forced logits vs incremental logits: compare channel-0 logits
    # derived from yl at every position
    yl = vt_decode(params["netG"], c, sl, zl, use_pallas=False)

    # reconstruct incremental yl by running a probe: reuse internals by
    # sampling greedily with all-primed and capturing equality of the
    # predictor outputs through logits comparison instead:
    from lvt_tpu.models.vt import vt_logits

    lg_ref = vt_logits(params["netG"], c, ctx, sl, sidx, use_pallas=False)

    # An independent incremental check of logits: greedy-sample with only
    # position 0 unprimed, for each position p in turn; the sampled value at
    # p must equal argmax of the teacher-forced channel factorization.
    # (cheap version: check p=0 and p=thw//2)
    for p in [0, thw // 2, thw - 1]:
        primed_p = jnp.ones((thw,), bool).at[p].set(False)
        out_p, _ = vti.sample_slice_incremental(
            params["netG"], c, (t, h, w), zl, sl, jax.random.key(0),
            primed_p, 1.0, greedy=True)
        out_p = np.asarray(out_p).reshape(1, c.nc, thw)
        # channel 0 greedy = argmax of teacher-forced channel-0 logits at p
        want0 = int(np.asarray(lg_ref).reshape(1, thw, c.nc, c.nv)[0, p, 0].argmax())
        assert out_p[0, 0, p] == want0


@pytest.mark.parametrize("case_idx,kv,seg", [
    (0, "native", 0), (0, "int8", 4), (1, "int8", 0), (3, "native", 0),
])
def test_streams_do_not_change_greedy_output(rng, case_idx, kv, seg):
    """Interleaved multi-stream rollout (VERDICT r4 #1a): every batch row's
    arithmetic is row-independent, so greedy sampling must be bit-invariant
    to the stream count — the exactness guard for the latency-hiding
    restructure. Covers block-local (DSFVT/DSSVT-like) and factored-bias
    geometries, native and int8 caches, seg boundaries."""
    stride, kernel, blocks, THW = CASES[case_idx]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(4, m.c.nc, *THW)), jnp.int32)
    key = jax.random.key(5)
    base = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                     greedy=True, kv_cache_dtype=kv,
                                     kv_seg_size=seg))
    for streams in (2, 4):
        got = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                        greedy=True, kv_cache_dtype=kv,
                                        kv_seg_size=seg, streams=streams))
        np.testing.assert_array_equal(base, got, err_msg=f"streams={streams}")
    with pytest.raises(ValueError, match="streams"):
        m.sample_video(params, video, key, n_prime=1, greedy=True,
                       streams=3)  # does not divide batch 4


def test_streams_teacher_logits_match_single_stream(rng):
    """teacher_logits through the multi-stream scan must reassemble the
    per-stream outputs into the exact single-stream (b, thw, nc, nv)
    layout."""
    stride, kernel, blocks, THW = CASES[0]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(2))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(4, m.c.nc, *THW)), jnp.int32)
    c = m.c
    plan = m._plan_for(*THW)
    t, h, w = plan.slice_shape
    vflat = video.reshape(4, c.nc, -1)
    sl = ssub.gather_slice(vflat, jnp.asarray(plan.slice_src[1]))
    ctx = m._gather_ctx(plan, vflat, 1)
    sidx = jnp.full((4,), 1, jnp.int32)
    zl = vt_encode(params["netG"], c, ctx, sidx, use_pallas=False)
    primed = jnp.ones((t * h * w,), bool)
    _, _, ref = vti.sample_slice_incremental(
        params["netG"], c, (t, h, w), zl, sl, jax.random.key(0), primed,
        1.0, teacher_logits=True)
    _, _, got = vti.sample_slice_incremental(
        params["netG"], c, (t, h, w), zl, sl, jax.random.key(0), primed,
        1.0, teacher_logits=True, streams=2)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_conv_tap_table_strictly_past():
    nbr, tap_ids = vti.conv_tap_table((2, 4, 4))
    thw = 32
    for p in range(thw):
        for j in nbr[p]:
            if j >= 0:
                assert j < p or j < p, f"tap at {j} not strictly before {p}"
                assert j < p


def test_block_structure_roundtrip():
    bid, rel = vti.block_structure((4, 4, 4), (2, 2, 2))
    assert bid.shape == (64,)
    # 8 blocks of 8 positions each
    assert len(np.unique(bid)) == 8
    for bb in range(8):
        assert (bid == bb).sum() == 8
        assert sorted(rel[bid == bb]) == list(range(8))


def test_seg_size_does_not_change_greedy_output(rng):
    """kv_seg_size is a perf knob only: any segment size must reproduce the
    default's greedy samples exactly."""
    stride, kernel, blocks, THW = CASES[1]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    key = jax.random.key(5)
    base = m.sample_video(params, video, key, n_prime=1, greedy=True)
    for seg in (4, 8, 64):
        got = m.sample_video(params, video, key, n_prime=1, greedy=True,
                             kv_seg_size=seg)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_quantize_cols_fold_is_exact(rng):
    """y @ (W_int * s) must equal (y @ W_int) * s, and dequantized int8
    weights must sit within one quantization step of the original."""
    w = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    wi, s = vti._quantize_cols(w, jnp.float32)
    deq = wi.astype(jnp.float32) * s[None, :]
    step = np.asarray(s)[None, :]
    assert np.all(np.abs(np.asarray(deq) - np.asarray(w)) <= step * 0.5 + 1e-6)

    y = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    np.testing.assert_allclose(np.asarray((y @ wi.astype(jnp.float32)) * s),
                               np.asarray(y @ deq), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv,weights,mm,attn", [
    # default tier: the shipping default (int8 KV), the coarsest cache
    # (int4), and the pallas attention path; the weight/mm quantization
    # combinations (perf-probe knobs, not shipped defaults) are slow tier
    ("int8", "native", "native", "xla"),
    ("int4", "native", "native", "xla"),
    ("int8", "native", "native", "pallas"),
    ("int8", "native", "native", "pallas-live"),
    pytest.param("native", "int8", "native", "xla", marks=pytest.mark.slow),
    pytest.param("int8", "int8", "native", "xla", marks=pytest.mark.slow),
    pytest.param("int8", "native", "int8", "xla", marks=pytest.mark.slow),
    pytest.param("int8", "int8", "int8", "xla", marks=pytest.mark.slow),
    pytest.param("int8", "int8", "native", "pallas",
                 marks=pytest.mark.slow),
    pytest.param("native", "int8-pallas", "native", "xla",
                 marks=pytest.mark.slow),
    pytest.param("int8", "int8-pallas", "native", "pallas",
                 marks=pytest.mark.slow),
])
def test_int8_modes_track_native_greedy(rng, kv, weights, mm, attn):
    """int8 KV caches / int8 streamed weights / int8 MXU attention dots are
    perf knobs whose only deviation is int8 rounding: greedy samples must
    agree with the native path at >= 90% of positions on a tiny model
    (bit-exactness is not guaranteed — argmax can flip where two logits are
    within rounding)."""
    stride, kernel, blocks, THW = CASES[0]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    key = jax.random.key(5)
    base = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                     greedy=True))
    got = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                    greedy=True, kv_cache_dtype=kv,
                                    weight_dtype=weights, mm_dtype=mm,
                                    attn_impl=attn))
    assert got.shape == base.shape and got.min() >= 0 and got.max() < m.c.nv
    agree = float((got == base).mean())
    floor = 0.75 if kv == "int4" else 0.90  # int4 rounding is 16x coarser
    assert agree >= floor, (
        f"greedy agreement {agree:.3f} with kv={kv}, w={weights}, mm={mm}, "
        f"attn={attn}")


def test_int8_mm_requires_int8_kv(rng):
    """mm_dtype='int8' reads the int8 cache bytes directly — any other
    kv_dtype must raise, not silently fall back."""
    stride, kernel, blocks, THW = CASES[0]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    with pytest.raises(ValueError, match="mm_dtype"):
        m.sample_video(params, video, jax.random.key(0), n_prime=1,
                       greedy=True, kv_cache_dtype="native", mm_dtype="int8")


@pytest.mark.parametrize("case_idx,seg,attn", [
    (1, 0, "pallas"), (1, 4, "pallas"), (3, 0, "pallas"), (4, 0, "pallas"),
    (1, 0, "pallas-live"), (3, 0, "pallas-live"), (4, 0, "pallas-live"),
])
def test_pallas_attn_tracks_native_on_block_geometries(rng, case_idx, seg,
                                                       attn):
    """attn_impl='pallas'/'pallas-live' must hold >=90% greedy agreement on
    the block-local cache geometry (DSSVT-like, case 1) — including
    segmented cache growth — and on the factored-bias fallback geometry
    (case 3), whose bias rows are rebuilt from the per-block tables per
    pixel. pallas-live additionally exercises the live-length masking of
    stale rows across block-run boundaries (its buffers are never zeroed
    between runs)."""
    stride, kernel, blocks, THW = CASES[case_idx]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    key = jax.random.key(5)
    base = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                     greedy=True))
    got = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                    greedy=True, kv_cache_dtype="int8",
                                    kv_seg_size=seg, attn_impl=attn))
    agree = float((got == base).mean())
    assert agree >= 0.90, (
        f"greedy agreement {agree:.3f} on case {case_idx} seg={seg} "
        f"attn={attn}")


def test_pallas_live_requires_int8(rng):
    stride, kernel, blocks, THW = CASES[0]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    with pytest.raises(ValueError, match="pallas-live"):
        m.sample_video(params, video, jax.random.key(0), n_prime=1,
                       greedy=True, kv_cache_dtype="native",
                       attn_impl="pallas-live")


@pytest.mark.parametrize("case_idx", [
    0,
    # the block-local and factored-bias geometries re-walk the same cached
    # decode per pixel — slow tier; case 0 keeps the anchor in the default
    pytest.param(1, marks=pytest.mark.slow),
    pytest.param(3, marks=pytest.mark.slow)])
def test_teacher_logits_match_xla_path(rng, case_idx):
    """logits_for_entire_video_incremental(kv native) must reproduce the
    teacher-forced XLA logits: same arithmetic, cached form. This is the
    exactness anchor for the int8-KV quality accounting (VERDICT r3 #2) —
    with a quantized cache the SAME function then measures exactly the
    logit error the quantization injects."""
    stride, kernel, blocks, THW = CASES[case_idx]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(2))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    ref = np.asarray(m.logits_for_entire_video(params, video))
    inc = np.asarray(m.logits_for_entire_video_incremental(params, video))
    # fp32 params: only accumulation-order rounding differs (per-pixel GEMMs
    # vs batched GEMMs)
    np.testing.assert_allclose(inc, ref, rtol=2e-4, atol=2e-4)

    # int8 cache: bounded deviation, not garbage — the full-scale error
    # measurement lives in tools/quality_int8.py; here just pin the contract
    q = np.asarray(m.logits_for_entire_video_incremental(
        params, video, kv_cache_dtype="int8"))
    assert np.isfinite(q).all()
    scale = np.abs(ref).max()
    assert np.abs(q - ref).max() < 0.25 * scale + 1e-3


@pytest.mark.parametrize("case_idx", [0, 1])
def test_pallas_attn_native_tracks_native(rng, case_idx):
    """attn_impl='pallas' with kv native (no quantization anywhere) must
    track the XLA native sampler at >=98% greedy agreement — the only
    deviations are dot/softmax accumulation-order rounding."""
    stride, kernel, blocks, THW = CASES[case_idx]
    cfg = _cfg(stride, kernel, blocks)
    m = VideoTransformer(cfg, T=THW[0], H=THW[1], W=THW[2])
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(
        rng.integers(0, m.c.nv, size=(2, m.c.nc, *THW)), jnp.int32)
    key = jax.random.key(5)
    base = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                     greedy=True))
    got = np.asarray(m.sample_video(params, video, key, n_prime=1,
                                    greedy=True, kv_cache_dtype="native",
                                    attn_impl="pallas"))
    agree = float((got == base).mean())
    assert agree >= 0.98, f"native-pallas agreement {agree:.3f} case {case_idx}"
