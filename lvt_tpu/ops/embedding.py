"""Embedding row-gathers with MXU-friendly backwards.

The VJP of a gather is a scatter-add. When many lookups hit few rows (every
embedding table in the VT: nv=512 rows fed by b*thw=16k+ lookups), XLA on TPU
serializes the colliding scatter — measured at seconds per step for the
context table before it was rewritten (ops/conv.py:_ctx_encode_bwd). The same
disease, at smaller scale, lives in the decoder's per-channel ``embed_sum``
gathers and the channel predictor's U_k row gathers
(reference videotransformer.py:80-89, :149).

``take_rows`` keeps the forward a plain gather (fast, used verbatim in the
sampling hot path) and rewrites only the backward as ``onehot(idx)^T @ g`` —
one (V, N) x (N, de) matmul on the MXU; the segment-sum it computes is
mathematically identical to the scatter-add.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _onehot_matmul_grad(idx, g, num_rows: int):
    """dtable = onehot(idx)^T @ g, fp32 accumulation.

    idx: (...,) int; g: (..., de) cotangent. Returns (num_rows, de) fp32.
    """
    de = g.shape[-1]
    gf = g.reshape(-1, de)
    ix = idx.reshape(-1, 1)
    cols = jnp.arange(num_rows, dtype=ix.dtype)[None, :]
    oh = (ix == cols).astype(g.dtype)  # (N, V)
    return jax.lax.dot_general(  # oh^T @ g -> (V, de)
        oh, gf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_rows(table, idx, num_rows):
    return jnp.take(table, idx, axis=0)


def _take_rows_fwd(table, idx, num_rows):
    return jnp.take(table, idx, axis=0), (idx, jnp.zeros((0,), table.dtype))


def _take_rows_bwd(num_rows, res, g):
    idx, proto = res
    dtable = _onehot_matmul_grad(idx, g, num_rows).astype(proto.dtype)
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)  # int input
    return dtable, didx


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` (gather rows of a (V, de) table by integer index array)
    whose backward is a one-hot matmul instead of XLA's serialized
    colliding scatter-add. Exact same values both ways for IN-RANGE indices
    (0 <= idx < V, the only case that occurs: all callers pass code/channel
    ids). Out-of-range indices differ at the edge: jnp.take's clip-mode VJP
    credits the clamped row, the one-hot backward gives zero gradient."""
    assert table.ndim == 2, table.shape
    return _take_rows(table, idx, table.shape[0])
