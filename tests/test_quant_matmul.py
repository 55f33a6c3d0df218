"""Tests for the int8-weight Pallas GEMM (ops/quant_matmul.py): the kernel
must match its XLA reference formulation exactly (same quantization math)
and track the unquantized matmul within int8 rounding error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.ops.quant_matmul import (matmul_i8w_pallas, matmul_i8w_xla,
                                      quantize_rows_i8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _quant_cols(w):
    s = np.max(np.abs(w), axis=0) / 127.0
    wi = np.clip(np.round(w / (s[None, :] + 1e-8)), -127, 127).astype(np.int8)
    return jnp.asarray(wi), jnp.asarray(s.astype(np.float32))


@pytest.mark.parametrize("b,d,n", [(4, 32, 96), (6, 64, 48), (8, 128, 128)])
def test_kernel_matches_xla_reference(rng, b, d, n):
    y = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    wi, sw = _quant_cols(rng.standard_normal((d, n)))
    ref = np.asarray(matmul_i8w_xla(y, wi, sw))
    got = np.asarray(matmul_i8w_pallas(y, wi, sw, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_tracks_unquantized_matmul(rng):
    """Against the exact fp32 product the only error is the two absmax
    roundings (weight columns + activation rows): ~0.5% relative."""
    b, d, n = 8, 256, 128
    w = rng.standard_normal((d, n)).astype(np.float32)
    y = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    wi, sw = _quant_cols(w)
    exact = np.asarray(y) @ w
    got = np.asarray(matmul_i8w_pallas(y, wi, sw, interpret=True))
    rel = np.abs(got - exact) / (np.abs(exact) + 1e-3)
    assert float(np.median(rel)) < 0.02, float(np.median(rel))


def test_quantize_rows_roundtrip(rng):
    y = rng.standard_normal((4, 64)).astype(np.float32)
    yi, sy = quantize_rows_i8(jnp.asarray(y))
    back = np.asarray(yi, np.float32) * np.asarray(sy)
    np.testing.assert_allclose(back, y, atol=float(np.abs(y).max()) / 127.0)
    assert np.asarray(yi).dtype == np.int8
    assert int(np.abs(np.asarray(yi)).max()) <= 127


def test_btile_division(rng):
    """Odd batch sizes fall back to smaller tiles; results identical."""
    b, d, n = 6, 32, 64
    y = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    wi, sw = _quant_cols(rng.standard_normal((d, n)))
    a = np.asarray(matmul_i8w_pallas(y, wi, sw, interpret=True))
    c = np.asarray(matmul_i8w_pallas(y, wi, sw, btile=2, interpret=True))
    np.testing.assert_allclose(a, c, atol=1e-6)
