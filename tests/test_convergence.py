"""Learning-dynamics tests: the models must actually fit data.

- tiny VQ-VAE overfits a small image set to low reconstruction MSE
- tiny VT overfits one code video: teacher-forced bits/dim collapses well
  below the uniform-code entropy
"""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.config import get_cfg
from lvt_tpu.engine import Trainer
from lvt_tpu.parallel.mesh import build_mesh

pytestmark = pytest.mark.slow  # real optimization runs, minutes each

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_vqvae_overfits_small_set(rng, tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    cfg.MODEL.ENCODER.NF = 32
    cfg.MODEL.ENCODER.RES_CHANNELS = 16
    cfg.MODEL.ENCODER.N_LAYERS = 1
    cfg.MODEL.GENERATOR.NF = 32
    cfg.MODEL.GENERATOR.RES_CHANNELS = 16
    cfg.MODEL.GENERATOR.N_LAYERS = 1
    cfg.MODEL.GENERATOR.IN_CHANNELS = 32
    cfg.MODEL.CODEBOOK.DIM = 32
    cfg.SOLVER.LR_G = 3e-3
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SEED = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"

    # 8 fixed smooth images in [0,1]
    y, x = np.mgrid[0:16, 0:16] / 16.0
    data = np.stack([
        np.stack([np.sin(4 * x + i), np.cos(3 * y + i), x * y + 0.1 * i], -1) * 0.4 + 0.5
        for i in range(8)
    ]).astype(np.float32)

    class L:
        def __iter__(self):
            while True:
                yield {"image": data}

    trainer = Trainer(cfg, L(), mesh=build_mesh(data=4))
    trainer.train(0, 150)
    recon_hist = trainer.storage.history("loss_reconstruction")
    # loss is on normalized [-1,1] scale; MSE should drop well under 0.1
    assert recon_hist.median(10) < 0.1, recon_hist.median(10)


def test_vt_overfits_single_video(rng, tmp_path):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 2, 8
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 64, 32, 32
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.SHARE_P = False
    cfg.SOLVER.OPTIMIZER_NAME = "adam"
    cfg.SOLVER.ADAM.BETA2_G = 0.999
    cfg.SOLVER.LR_G = 2e-3
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SEED = 3
    cfg.TPU.COMPUTE_DTYPE = "float32"

    video = rng.integers(0, 8, size=(1, 2, 4, 4, 4)).astype(np.int32)
    batch_video = np.repeat(video, 8, axis=0)

    from lvt_tpu.models.vt import VideoTransformer

    class L:
        def __iter__(self):
            while True:
                yield {"video": batch_video}

    model = VideoTransformer(cfg, T=4, H=4, W=4)
    trainer = Trainer(cfg, L(), model=model, mesh=build_mesh(data=4))
    trainer.train(0, 200)
    ce = trainer.storage.history("loss_cross_entropy").median(10)
    # uniform over 8 codes = ln 8 = 2.079 nats; memorization should go far below
    assert ce < 0.7, ce
