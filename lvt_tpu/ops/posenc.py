"""N-dimensional sinusoidal positional encoding (reference:
vidgen/modeling/autoregressive/vt_attention.py:10-50).

Channels-last layout: x is (..., t, h, w, d). Each spatial axis owns a
contiguous channel band of 2*num_timescales channels (sin block then cos
block), bands laid out axis-major from channel 0; trailing channels beyond
3*2*num_timescales stay untouched — exactly the reference's per-axis pad."""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _signal_np(shape, d_model, min_timescale=1.0, max_timescale=1.0e4):
    num_dims = len(shape)
    assert d_model >= num_dims * 2, "d_model must be >= 2 * num_dims"
    nts = d_model // (num_dims * 2)
    log_inc = np.log(max_timescale / min_timescale) / nts
    inv_timescales = min_timescale * np.exp(np.arange(nts, dtype=np.float32) * -log_inc)

    total = np.zeros(shape + (d_model,), dtype=np.float32)
    for dim, length in enumerate(shape):
        pos = np.arange(length, dtype=np.float32)
        scaled = pos[:, None] * inv_timescales[None, :]  # (length, nts)
        sig = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)  # (length, 2*nts)
        band = np.zeros((length, d_model), dtype=np.float32)
        band[:, dim * 2 * nts : (dim + 1) * 2 * nts] = sig
        # broadcast over the other axes
        bshape = [1] * num_dims + [d_model]
        bshape[dim] = length
        total = total + band.reshape(bshape)
    return total


def add_positional_encoding(x: jnp.ndarray, num_dims: int = 3) -> jnp.ndarray:
    """x: (..., s1, ..., s_num_dims, d); returns x + PE."""
    shape = tuple(int(s) for s in x.shape[-num_dims - 1 : -1])
    d_model = int(x.shape[-1])
    sig = _signal_np(shape, d_model)
    return x + jnp.asarray(sig, dtype=x.dtype)
