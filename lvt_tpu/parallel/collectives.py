"""Differentiable collectives (reference: vidgen/layers/all_gather.py:13-133,
batch_norm.py:148-160).

The reference hand-writes autograd Functions: AllGatherFunc (backward =
reduce_scatter built from N async dist.reduce calls) and AllReduce (forward
all_gather+sum, backward all_reduce). Under JAX these are one-liners —
``jax.lax`` collectives are differentiable primitives whose transposes ARE
the matching collectives (all_gather^T = psum_scatter, psum^T = psum). This
module exposes the same names for API parity; everything must run inside
shard_map/pjit with a named mesh axis.
"""

import jax

__all__ = ["all_gather", "reduce_scatter", "all_reduce", "all_to_all", "ppermute"]


def all_gather(x, axis_name: str, *, axis: int = 0, tiled: bool = True):
    """Differentiable all-gather along a mesh axis; gradient is the
    reduce-scatter the reference builds by hand (all_gather.py:95-119)."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def reduce_scatter(x, axis_name: str, *, scatter_dimension: int = 0, tiled: bool = True):
    return jax.lax.psum_scatter(x, axis_name,
                                scatter_dimension=scatter_dimension, tiled=tiled)


def all_reduce(x, axis_name: str):
    """Sum across the axis; self-transposing (reference AllReduce,
    batch_norm.py:148-160)."""
    return jax.lax.psum(x, axis_name)


def all_to_all(x, axis_name: str, split_axis: int, concat_axis: int):
    return jax.lax.all_to_all(x, axis_name, split_axis, concat_axis, tiled=True)


def ppermute(x, axis_name: str, perm):
    return jax.lax.ppermute(x, axis_name, perm)
