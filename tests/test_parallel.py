"""Collectives and mesh tests on the 8-device CPU mesh: differentiable
all_gather/reduce_scatter semantics (the reference's hand-written autograd
Functions, layers/all_gather.py), SyncBN-as-psum."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lvt_tpu.parallel import collectives
from lvt_tpu.parallel.mesh import build_mesh


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def test_all_gather_forward_and_grad(rng):
    mesh = _mesh(4)
    x = rng.standard_normal((8, 3)).astype(np.float32)  # 2 rows per device

    def f(x_shard):
        return collectives.all_gather(x_shard, "data")

    y = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(jnp.asarray(x))
    # every shard holds the full array -> concatenated output repeats it 4x? no:
    # out_specs P("data") reassembles; with tiled gather each shard returns the
    # full (8,3), stacked along data -> (32,3)
    assert y.shape == (32, 3)
    np.testing.assert_allclose(np.asarray(y)[:8], x, rtol=1e-6)

    # gradient of sum(all_gather(x)) wrt x = world_size: every device's
    # gathered copy contributes 1, and the transpose (psum_scatter) sums them
    def loss(x_shard):
        return jnp.sum(collectives.all_gather(x_shard, "data"))

    g = shard_map(jax.grad(loss), mesh=mesh, in_specs=P("data"),
                  out_specs=P("data"))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.full_like(x, 4.0), rtol=1e-6)


def test_all_reduce(rng):
    mesh = _mesh(4)
    x = rng.standard_normal((4, 5)).astype(np.float32)

    def f(x_shard):
        return collectives.all_reduce(x_shard.sum(axis=0), "data")

    y = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x.sum(axis=0), rtol=1e-5)


def test_reduce_scatter(rng):
    mesh = _mesh(4)
    x = rng.standard_normal((4, 8)).astype(np.float32)

    def f(x_shard):
        # each shard holds (1, 8); scatter-reduce over the 8 columns... use
        # rows: psum_scatter of a (4,) vector -> (1,) per device
        v = jnp.broadcast_to(x_shard.sum(), (4,))
        return collectives.reduce_scatter(v, "data")

    y = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(jnp.asarray(x))
    # each device contributes broadcast(sum of its row); scatter sums across
    # devices -> every output element = total sum
    np.testing.assert_allclose(np.asarray(y), np.full((4,), x.sum()), rtol=1e-5)


def test_sync_batch_norm_matches_global(rng):
    """SyncBN via pmean == BN on the concatenated batch (reference
    NaiveSyncBatchNorm, batch_norm.py:163-232)."""
    from lvt_tpu.models.norms import apply_norm, init_norm

    mesh = _mesh(4)
    x = rng.standard_normal((8, 4, 4, 6)).astype(np.float32)
    params, state = init_norm("SyncBN", 6)

    def f(x_shard):
        y, ns = apply_norm("SyncBN", params, state, x_shard, train=True,
                           axis_name="data")
        return y, ns["mean"]

    y, means = shard_map(f, mesh=mesh, in_specs=P("data"),
                         out_specs=(P("data"), P()))(jnp.asarray(x))
    # batch stats are global:
    want_mean = x.mean(axis=(0, 1, 2))
    got_global, _ = apply_norm("BN", params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(got_global), atol=1e-5)


def test_build_mesh_shapes():
    m = build_mesh(data=4, model=2)
    assert m.devices.shape == (4, 2)
    m = build_mesh(data=-1, model=2)
    assert m.devices.shape == (4, 2)
