"""Vector quantization: fused nearest-neighbor lookup, straight-through
estimator, and cross-replica EMA codebook update.

Functional rebuild of the reference quantizer stack
(vidgen/modeling/vq/vq_utils.py:5-65, vq_embedding.py:9-99):

* nearest-neighbor via the same expansion ``||c||^2 + ||x||^2 - 2 x.c``
  accumulated in fp32; ``jnp.argmin`` breaks ties toward the lowest index,
  matching ``torch.min`` — required for bit-matched codebook indices.
* straight-through: grad w.r.t. inputs is the identity (reference
  vq_utils.py:52-54); grad w.r.t. the codebook (live in non-EMA mode) flows
  through ``embedding.take_rows`` — same segment-sums as the reference's
  ``index_add_`` scatter, computed as a one-hot matmul on the MXU instead
  of XLA's serialized colliding scatter-add.
* EMA update (reference vq_embedding.py:40-59) is pure state-in/state-out;
  cross-replica reduction of (cluster size, cluster sum) is a ``psum`` over
  the data mesh axis — the TPU-native form of the reference's AllReduce
  autograd Function (layers/batch_norm.py:148-160).

Update-order subtlety replicated exactly (SURVEY.md §7 "hard parts" #1): the
straight-through output uses the *pre-update* embedding, while the returned
differentiable ``z_q`` uses the *post-update* embedding (reference
vq_embedding.py:37 vs :61-62).

A Pallas kernel fuses the distance matmul + argmin + codebook gather in VMEM
(no HBM roundtrip for the (N, K) distance matrix); the pure-XLA path is used
on CPU and as the reference for kernel tests.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .embedding import take_rows


class EmaCodebookState(NamedTuple):
    """Buffers of one (possibly decomposed) EMA codebook.

    embedding:    (num, K, Dc) — current codebook vectors
    running_size: (num, K)     — EMA cluster sizes
    running_sum:  (num, K, Dc) — EMA cluster vector sums
    """

    embedding: jnp.ndarray
    running_size: jnp.ndarray
    running_sum: jnp.ndarray


def init_codebook(key, num: int, K: int, D: int) -> EmaCodebookState:
    """Uniform(-1/K, 1/K) init (reference vq_embedding.py:12-13); running_sum
    starts as a copy of the embedding, running_size as zeros (:20-21)."""
    Dc = D // num
    emb = jax.random.uniform(key, (num, K, Dc), jnp.float32, -1.0 / K, 1.0 / K)
    return EmaCodebookState(
        embedding=emb,
        running_size=jnp.zeros((num, K), jnp.float32),
        # distinct buffer: embedding and running_sum must not alias (donation)
        running_sum=emb.copy(),
    )


# --------------------------------------------------------------------------
# Nearest-neighbor core
# --------------------------------------------------------------------------

def _distances(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """(N, Dc) x (K, Dc) -> (N, K) squared-distance surrogate in fp32."""
    z = z.astype(jnp.float32)
    codebook = codebook.astype(jnp.float32)
    c_sqr = jnp.sum(codebook ** 2, axis=1)  # (K,)
    z_sqr = jnp.sum(z ** 2, axis=1, keepdims=True)  # (N, 1)
    # Precision.HIGHEST: TPU matmuls default to bf16 inputs; index bit-parity
    # needs full fp32 accumulation.
    cross = jax.lax.dot_general(
        z, codebook,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (N, K)
    return c_sqr[None, :] + z_sqr - 2.0 * cross


def nearest_indices_xla(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||z - c_k||^2 ; ties -> lowest index. z: (N, Dc)."""
    return jnp.argmin(_distances(z, codebook), axis=1).astype(jnp.int32)


def nearest_indices_pallas(z: jnp.ndarray, codebook: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Pallas TPU kernel: fused distance + argmin, distances stay in VMEM.

    z: (N, Dc), codebook: (K, Dc). Mosaic notes (found the hard way on v5e):
    keep every intermediate 2-D (1-D (K,) temporaries crash the compiler),
    express argmin as min + masked-iota-min (ties -> lowest index, same as
    torch.min), and write a lane-broadcast (TILE, 128) int32 output — narrow
    int outputs fail XLA/Mosaic layout verification.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N0, Dc = z.shape
    K = codebook.shape[0]
    TILE_N = 256
    N = ((N0 + TILE_N - 1) // TILE_N) * TILE_N
    if N != N0:
        z = jnp.pad(z, ((0, N - N0), (0, 0)))

    def kernel(z_ref, cb_ref, idx_ref):
        zf = z_ref[:].astype(jnp.float32)
        cb = cb_ref[:].astype(jnp.float32)
        z_sqr = jnp.sum(zf * zf, axis=1, keepdims=True)  # (TILE, 1)
        c_sqr = jnp.sum(cb * cb, axis=1, keepdims=True)  # (K, 1)
        cross = jax.lax.dot_general(
            zf, cb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE_N, K)
        dist = z_sqr + c_sqr.T - 2.0 * cross
        m = jnp.min(dist, axis=1, keepdims=True)
        ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        idx = jnp.min(jnp.where(dist <= m, ids, K), axis=1, keepdims=True)
        idx_ref[:] = jnp.broadcast_to(idx, (idx.shape[0], 128))

    out = pl.pallas_call(
        kernel,
        grid=(N // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, Dc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Dc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        interpret=interpret,
    )(z, codebook)
    return out[:N0, 0]


@jax.custom_vjp
def _nearest_indices_pallas_nd(z, codebook):
    """pallas_call has no autodiff rule; the int32 indices carry no gradient,
    so give the kernel an explicit zero-cotangent VJP for use under jax.grad."""
    return nearest_indices_pallas(z, codebook)


def _nip_fwd(z, codebook):
    return nearest_indices_pallas(z, codebook), (z, codebook)


def _nip_bwd(res, g):
    z, codebook = res
    return jnp.zeros_like(z), jnp.zeros_like(codebook)


_nearest_indices_pallas_nd.defvjp(_nip_fwd, _nip_bwd)


def nearest_indices(z: jnp.ndarray, codebook: jnp.ndarray, *, use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, XLA elsewhere. z: (N, Dc) -> (N,) int32."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _nearest_indices_pallas_nd(z, codebook)
    return nearest_indices_xla(z, codebook)


# --------------------------------------------------------------------------
# Straight-through quantization + EMA update (single sub-codebook)
# --------------------------------------------------------------------------

def _ema_stats(z: jnp.ndarray, indices: jnp.ndarray, K: int,
               axis_name: Optional[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch cluster size and sum, psum'd across the data axis."""
    z = jax.lax.stop_gradient(z.astype(jnp.float32))
    one_hot = jax.nn.one_hot(indices, K, dtype=jnp.float32)  # (N, K)
    size = jnp.sum(one_hot, axis=0)  # (K,)
    vec_sum = jax.lax.dot_general(
        one_hot, z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, Dc)
    if axis_name is not None:
        size = jax.lax.psum(size, axis_name)
        vec_sum = jax.lax.psum(vec_sum, axis_name)
    return size, vec_sum


def _ema_update(running_size, running_sum, size, vec_sum,
                decay: float, eps: float):
    """The EMA embedding is fully determined by the running sums — the
    current embedding does not participate (reference vq_embedding.py:56-59)."""
    K = running_size.shape[0]
    new_size = running_size * decay + (1.0 - decay) * size
    new_sum = running_sum * decay + (1.0 - decay) * vec_sum
    n = jnp.sum(new_size)
    denom = (new_size + eps) / (n + K * eps) * n
    new_emb = new_sum / denom[:, None]
    return new_emb, new_size, new_sum


def quantize_st(
    z_e: jnp.ndarray,
    state: EmaCodebookState,
    *,
    ema: bool,
    train: bool,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    use_pallas: Optional[bool] = None,
):
    """Straight-through quantization of decomposed codes.

    z_e: (..., D) with D = num * Dc. Returns (z_q_st, z_q, new_state):
    z_q_st carries identity gradient to z_e; z_q is the post-EMA-update
    lookup carrying codebook gradients (for the non-EMA loss term).
    """
    num, K, Dc = state.embedding.shape
    lead = z_e.shape[:-1]
    z = z_e.reshape(-1, num, Dc)  # (N, num, Dc)
    N = z.shape[0]

    idx_parts, st_parts, q_parts = [], [], []
    new_emb, new_rs, new_rsum = [], [], []
    for i in range(num):
        zi = z[:, i, :]
        emb_i = state.embedding[i]
        idx = nearest_indices(zi, jax.lax.stop_gradient(emb_i), use_pallas=use_pallas)
        # straight-through uses the PRE-update embedding (reference :37)
        z_q_pre = jnp.take(jax.lax.stop_gradient(emb_i), idx, axis=0)
        st = zi + jax.lax.stop_gradient(z_q_pre - zi.astype(z_q_pre.dtype)).astype(zi.dtype)

        if ema and train:
            size, vec_sum = _ema_stats(zi, idx, K, axis_name)
            e, rs, rsum = _ema_update(
                state.running_size[i], state.running_sum[i],
                size, vec_sum, decay, eps,
            )
        else:
            e, rs, rsum = emb_i, state.running_size[i], state.running_sum[i]

        # differentiable lookup uses the POST-update embedding (reference :61).
        # take_rows: identical forward, but the backward (live in non-EMA
        # mode, where the codebook is a grad param) is a one-hot matmul
        # instead of XLA's serialized colliding scatter-add (CLAUDE.md)
        q = take_rows(e, idx)

        idx_parts.append(idx)
        st_parts.append(st)
        q_parts.append(q)
        new_emb.append(e)
        new_rs.append(rs)
        new_rsum.append(rsum)

    z_q_st = jnp.stack(st_parts, axis=1).reshape(z_e.shape)
    z_q = jnp.stack(q_parts, axis=1).reshape(lead + (num * Dc,)).astype(z_e.dtype)
    indices = jnp.stack(idx_parts, axis=1).reshape(lead + (num,))
    new_state = EmaCodebookState(
        embedding=jnp.stack(new_emb),
        running_size=jnp.stack(new_rs),
        running_sum=jnp.stack(new_rsum),
    )
    return z_q_st, z_q, indices, new_state


def encode_indices(z_e: jnp.ndarray, state: EmaCodebookState,
                   *, use_pallas: Optional[bool] = False) -> jnp.ndarray:
    """(..., D) -> (..., num) int32 codebook indices (reference mode="").

    Defaults to the fp32 HIGHEST-precision XLA path: this is the
    CodesExtractor / eval path where index bit-parity matters more than the
    (tiny) speed difference; the Pallas kernel's MXU matmul rounds near-ties
    differently.
    """
    num, K, Dc = state.embedding.shape
    lead = z_e.shape[:-1]
    z = z_e.reshape(-1, num, Dc)
    idx = [
        nearest_indices(z[:, i, :], state.embedding[i], use_pallas=use_pallas)
        for i in range(num)
    ]
    return jnp.stack(idx, axis=1).reshape(lead + (num,))


def embed_indices(indices: jnp.ndarray, state: EmaCodebookState) -> jnp.ndarray:
    """(..., num) int32 -> (..., D) embeddings, chunk-concatenated
    (reference DVQEmbedding mode="emb", vq_embedding.py:92-97)."""
    num, K, Dc = state.embedding.shape
    parts = [jnp.take(state.embedding[i], indices[..., i], axis=0) for i in range(num)]
    return jnp.concatenate(parts, axis=-1)
