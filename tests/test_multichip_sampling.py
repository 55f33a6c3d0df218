"""Multi-chip generation: sample_video jitted with the batch sharded over an
8-device data mesh — the serving scale-out path (each chip rolls out its
shard) — and with TENSOR-PARALLEL params on a (data, model) mesh (GSPMD
inserts the head-parallel collectives; greedy samples must match the
replicated rollout)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lvt_tpu.config import get_cfg
from lvt_tpu.models.vt import VideoTransformer
from lvt_tpu.parallel.mesh import build_mesh
from lvt_tpu.parallel.sharding import shard_tree


def _tiny_vt():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 2, 8
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.SHARE_P = False
    return VideoTransformer(cfg, T=4, H=4, W=4)


def test_sample_video_sharded_over_data_axis(rng):
    m = _tiny_vt()
    params, _ = m.init(jax.random.key(0))
    mesh = build_mesh(data=8, model=1)

    video = jnp.asarray(rng.integers(0, m.c.nv, size=(16, m.c.nc, 4, 4, 4)),
                        jnp.int32)
    video_sharded = jax.device_put(video, NamedSharding(mesh, P("data")))
    params_rep = jax.device_put(params, NamedSharding(mesh, P()))

    out = jax.jit(lambda p, vd, k: m.sample_video(p, vd, k, n_prime=1))(
        params_rep, video_sharded, jax.random.key(3))
    out_np = np.asarray(out)
    assert out_np.shape == video.shape
    # primed frame untouched, samples in range, output stays sharded
    np.testing.assert_array_equal(out_np[:, :, 0], np.asarray(video)[:, :, 0])
    assert out_np.min() >= 0 and out_np.max() < m.c.nv
    assert len(out.sharding.device_set) == 8


def test_sample_video_tp_matches_replicated(rng):
    """TP-sharded serving (VERDICT r2 #6): greedy sample_video with params
    split over the model axis of a (4, 2) mesh must reproduce the (8, 1)
    replicated rollout — mirrors test_tp.py's train-step equality for the
    serving path. Head-parallel wq/wk/wv, row-parallel proj/ffn_w2: GSPMD
    inserts the psums inside the per-pixel scan."""
    m = _tiny_vt()
    params, _ = m.init(jax.random.key(0))
    video = jnp.asarray(rng.integers(0, m.c.nv, size=(8, m.c.nc, 4, 4, 4)),
                        jnp.int32)
    key = jax.random.key(5)

    def run(mesh):
        params_s = shard_tree(mesh, params)
        video_s = jax.device_put(video, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda p, vd, k: m.sample_video(
            p, vd, k, n_prime=1, greedy=True))(params_s, video_s, key)
        return np.asarray(out)

    out_rep = run(build_mesh(data=8, model=1))
    out_tp = run(build_mesh(data=4, model=2))
    # greedy argmax over well-separated random-init logits: bit-equal codes
    # (collective reduction-order rounding is ~1e-6 of the logit scale)
    agree = float((out_rep == out_tp).mean())
    assert agree == 1.0, f"TP sampling diverged: {agree:.4f} agreement"

    # and the TP run really is tensor-parallel, not silently replicated
    mesh_tp = build_mesh(data=4, model=2)
    wq = shard_tree(mesh_tp, params)["netG"]["decoder"]["layers"][0].wq
    assert wq.sharding.spec == P("model"), wq.sharding


def test_sample_video_sharded_pallas_attn(rng):
    """The Pallas decode-attention path must survive data-axis GSPMD
    sharding (serving scale-out) and reproduce the unsharded rollout —
    its caches live inside the scan carry, so every shard runs its own
    fused-lane caches."""
    m = _tiny_vt()
    params, _ = m.init(jax.random.key(0))
    mesh = build_mesh(data=8, model=1)
    video = jnp.asarray(rng.integers(0, m.c.nv, size=(16, m.c.nc, 4, 4, 4)),
                        jnp.int32)
    key = jax.random.key(3)

    def call(p, vd):
        return m.sample_video(p, vd, key, n_prime=1, greedy=True,
                              kv_cache_dtype="int8", attn_impl="pallas")

    video_s = jax.device_put(video, NamedSharding(mesh, P("data")))
    params_rep = jax.device_put(params, NamedSharding(mesh, P()))
    out = np.asarray(jax.jit(call)(params_rep, video_s))
    base = np.asarray(jax.jit(call)(params, video))
    np.testing.assert_array_equal(out, base)
