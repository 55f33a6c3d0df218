"""The int8 cache-attention Pallas experiment must stay correct (interpret
mode); see lvt_tpu/ops/cache_attention.py for the measured verdict."""

import jax.numpy as jnp
import numpy as np

from lvt_tpu.ops.cache_attention import cache_attention_pallas, cache_attention_xla


def test_cache_attention_kernel_matches_xla(rng):
    b, na, CL, da = 2, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, na, da)).astype(np.float32))
    k8 = jnp.asarray(rng.integers(-127, 128, size=(b, na, CL, da)).astype(np.int8))
    v8 = jnp.asarray(rng.integers(-127, 128, size=(b, na, CL, da)).astype(np.int8))
    ks = jnp.asarray(np.abs(rng.standard_normal((b, na, CL))).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.standard_normal((b, na, CL))).astype(np.float32) * 0.01)
    extra = jnp.asarray(rng.standard_normal((b, na, CL)).astype(np.float32))
    scale = 1 / np.sqrt(da)
    ref = np.asarray(cache_attention_xla(q, k8, ks, v8, vs, extra, scale))
    got = np.asarray(cache_attention_pallas(q, k8, ks, v8, vs, extra, scale,
                                            interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_decode_attention_i8_kernel_matches_xla(rng):
    """The round-3 int8-MXU-dot decode kernel (fused-lane caches,
    block-diagonal q) must match its XLA reference formulation exactly in
    interpret mode — both run the identical int8 dot + f32 softmax math."""
    from lvt_tpu.ops.cache_attention import (blockdiag_expand,
                                             decode_attention_i8_pallas,
                                             decode_attention_i8_xla)

    b, na, CL, da = 4, 2, 32, 16
    d = na * da
    qi = jnp.asarray(rng.integers(-127, 128, size=(b, na, da)).astype(np.int8))
    qbd = blockdiag_expand(qi)
    # block-diagonal structure: row a occupies exactly lanes [a*da,(a+1)*da)
    dense = np.zeros((b, na, d), np.int8)
    for a in range(na):
        dense[:, a, a * da:(a + 1) * da] = np.asarray(qi)[:, a]
    np.testing.assert_array_equal(np.asarray(qbd), dense)

    sq = jnp.asarray(np.abs(rng.standard_normal((b, na, 1))).astype(np.float32) * 0.01 + 1e-4)
    k4 = jnp.asarray(rng.integers(-127, 128, size=(b, CL, d)).astype(np.int8))
    v4 = jnp.asarray(rng.integers(-127, 128, size=(b, CL, d)).astype(np.int8))
    ks = jnp.asarray(np.abs(rng.standard_normal((b, na, CL))).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.standard_normal((b, na, CL))).astype(np.float32) * 0.01)
    extra = jnp.asarray(np.where(
        np.arange(CL)[None, None, :] > CL // 2, -1e9,
        rng.standard_normal((1, na, CL)) * 0.1).astype(np.float32))
    scale = 1 / np.sqrt(da)
    ref = np.asarray(decode_attention_i8_xla(qbd, sq, k4, ks, v4, vs,
                                             extra, scale))
    got = np.asarray(decode_attention_i8_pallas(
        qbd, sq, k4, ks, v4, vs, extra, scale, out_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
    # odd batch exercises the btile=1 fallback
    ref3 = np.asarray(decode_attention_i8_xla(qbd[:3], sq[:3], k4[:3],
                                              ks[:3], v4[:3], vs[:3],
                                              extra, scale))
    got3 = np.asarray(decode_attention_i8_pallas(
        qbd[:3], sq[:3], k4[:3], ks[:3], v4[:3], vs[:3], extra, scale,
        out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got3, ref3, atol=1e-4, rtol=1e-4)


def test_decode_attention_native_kernel_matches_xla(rng):
    """The native-dtype (no quantization) decode kernel must match its XLA
    reference formulation in interpret mode."""
    from lvt_tpu.ops.cache_attention import (blockdiag_expand,
                                             decode_attention_pallas,
                                             decode_attention_xla)

    b, na, CL, da = 4, 2, 32, 16
    d = na * da
    q = jnp.asarray(rng.standard_normal((b, na, da)).astype(np.float32))
    qbd = blockdiag_expand(q)
    k4 = jnp.asarray(rng.standard_normal((b, CL, d)).astype(np.float32))
    v4 = jnp.asarray(rng.standard_normal((b, CL, d)).astype(np.float32))
    extra = jnp.asarray(np.where(
        np.arange(CL)[None, None, :] > CL // 2, -1e9,
        rng.standard_normal((1, na, CL)) * 0.1).astype(np.float32))
    scale = 1 / np.sqrt(da)
    ref = np.asarray(decode_attention_xla(qbd, k4, v4, extra[0], scale))
    got = np.asarray(decode_attention_pallas(
        qbd, k4, v4, extra, scale, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_decode_attention_i8_live_kernel_matches_xla(rng):
    """The round-5 full-buffer + live-length flash-decode kernel: for every
    live length (partial tile, tile boundary, one row, full buffer) the
    kernel must match the masked XLA reference — rows >= live are never
    read, so garbage in them must not affect the output. The online-softmax
    + per-tile weight quantization differs from the single-pass reference
    only by int8 rounding: the kernel quantizes the UNNORMALIZED
    exp-weights per tile (dividing by the denominator at the end) while
    the reference quantizes once per full row, so both are independently
    ~1/127-rounded views of the same float attention and their DIFFERENCE
    can reach ~2x a single scheme's rounding (verified against an exact
    numpy emulation of the kernel's algorithm: kernel == emulation
    bit-for-bit in interpret mode; the tolerance below covers the
    scheme-vs-scheme delta). Exactness guards live elsewhere: the
    poisoned-stale-rows check here and the model-level greedy-agreement
    test (test_vt_incremental.py)."""
    from lvt_tpu.ops.cache_attention import (blockdiag_expand,
                                             decode_attention_i8_live_pallas,
                                             decode_attention_i8_live_xla)

    b, na, R, da, rtile = 4, 2, 64, 16, 16
    d = na * da
    qi = jnp.asarray(rng.integers(-127, 128, size=(b, na, da)).astype(np.int8))
    qbd = blockdiag_expand(qi)
    # row-major layouts (scales (b, R, na), bias (1, R, na), q scales
    # (b, 1, na)) — the kernel's Mosaic-legal orientation
    sq = jnp.asarray(np.abs(rng.standard_normal((b, 1, na))).astype(np.float32) * 0.01 + 1e-4)
    k4 = jnp.asarray(rng.integers(-127, 128, size=(b, R, d)).astype(np.int8))
    v4 = jnp.asarray(rng.integers(-127, 128, size=(b, R, d)).astype(np.int8))
    ks = jnp.asarray(np.abs(rng.standard_normal((b, R, na))).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.standard_normal((b, R, na))).astype(np.float32) * 0.01)
    extra = jnp.asarray((rng.standard_normal((1, R, na)) * 0.1).astype(np.float32))
    scale = 1 / np.sqrt(da)

    for live in (1, 7, rtile, rtile + 5, 3 * rtile, R):
        ref = np.asarray(decode_attention_i8_live_xla(
            live, qbd, sq, k4, ks, v4, vs, extra, scale))
        got = np.asarray(decode_attention_i8_live_pallas(
            live, qbd, sq, k4, ks, v4, vs, extra, scale, rtile=rtile,
            out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, ref, atol=3e-2, rtol=1e-1,
                                   err_msg=f"live={live}")

    # stale rows past live must be dead: poison them and re-check live=20
    k4p = k4.at[:, 20:].set(127)
    v4p = v4.at[:, 20:].set(-128)
    ksp = ks.at[:, 20:].set(1e6)
    vsp = vs.at[:, 20:].set(1e6)
    ref = np.asarray(decode_attention_i8_live_xla(
        20, qbd, sq, k4, ks, v4, vs, extra, scale))
    got = np.asarray(decode_attention_i8_live_pallas(
        20, qbd, sq, k4p, ksp, v4p, vsp, extra, scale, rtile=rtile,
        out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=5e-2)
