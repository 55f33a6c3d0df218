"""Multi-chip generation: sample_video jitted with the batch sharded over an
8-device data mesh — the serving scale-out path (each chip rolls out its
shard; no cross-chip communication needed)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lvt_tpu.config import get_cfg
from lvt_tpu.models.vt import VideoTransformer
from lvt_tpu.parallel.mesh import build_mesh


def test_sample_video_sharded_over_data_axis(rng):
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

    m = VideoTransformer(cfg, T=4, H=4, W=4)
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
