"""Training-visualization paths (reference visualize_training): image grids
land in EventStorage for both meta-archs."""

import jax
import jax.numpy as jnp
import numpy as np

from lvt_tpu.config import get_cfg
from lvt_tpu.models.vqvae import VQVAE
from lvt_tpu.models.vt import VideoTransformer


def test_vqvae_visualize(rng):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VQVAEModel"
    cfg.MODEL.ENCODER.NAME = "ResEncoder"
    cfg.MODEL.ENCODER.IN_CHANNELS = 3
    cfg.MODEL.ENCODER.NF = 16
    cfg.MODEL.ENCODER.RES_CHANNELS = 8
    cfg.MODEL.ENCODER.N_LAYERS = 1
    cfg.MODEL.GENERATOR.NAME = "ResDecoder"
    cfg.MODEL.GENERATOR.IN_CHANNELS = 16
    cfg.MODEL.GENERATOR.NF = 16
    cfg.MODEL.GENERATOR.RES_CHANNELS = 8
    cfg.MODEL.GENERATOR.N_LAYERS = 1
    cfg.MODEL.GENERATOR.OUT_CHANNELS = 3
    cfg.MODEL.GENERATOR.OUT_ACTIVATION = "tanh"
    cfg.MODEL.CODEBOOK.DIM = 16
    cfg.MODEL.CODEBOOK.NUM = 4
    cfg.MODEL.CODEBOOK.EMA = True
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    batch = {"image": rng.random((4, 16, 16, 3)).astype(np.float32)}
    images = model.visualize_training(params, state, batch)
    assert "reconstruction" in images
    img = images["reconstruction"]
    assert img.ndim == 3 and img.shape[0] in (1, 3)
    assert img.dtype == np.uint8


def test_vt_visualize(rng):
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
    params, state = m.init(jax.random.key(0))
    batch = {"video": jnp.asarray(
        rng.integers(0, 8, size=(2, 2, 4, 4, 4)), jnp.int32)}
    images = m.visualize_training(params, state, batch)
    assert set(images) == {"gt_slice", "sampled_slice"}
    for img in images.values():
        assert img.dtype == np.uint8 and img.ndim == 3


def test_vt_visualize_class_conditional(rng):
    """Class-conditional VT (CLASS_NUM > 0): visualize_training must thread
    the class index through vt_encode — without it the encoder projector
    (built for 2*de channels) sees de channels and shape-errors, which
    trainer.py's catch-all would silently swallow at train time."""
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
    v.CLASS_NUM = 5
    m = VideoTransformer(cfg, T=4, H=4, W=4)
    params, state = m.init(jax.random.key(0))
    batch = {
        "video": jnp.asarray(
            rng.integers(0, 8, size=(2, 2, 4, 4, 4)), jnp.int32),
        "class": jnp.asarray(rng.integers(0, 5, size=(2,)), jnp.int32),
    }
    images = m.visualize_training(params, state, batch)
    assert set(images) == {"gt_slice", "sampled_slice"}
    for img in images.values():
        assert img.dtype == np.uint8 and img.ndim == 3
