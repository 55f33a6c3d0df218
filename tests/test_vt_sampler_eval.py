"""VTSampler end-to-end: sample code videos, decode with the paired VQ-VAE,
write codes.npy + pngs in the reference samples/ layout."""

import os

import jax
import numpy as np
import pytest

from lvt_tpu.config import get_cfg
from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvt_tpu.data.datasets.latents import get_latent_video_paths
from lvt_tpu.engine.defaults import run_test
from lvt_tpu.models.vt import VideoTransformer

TINY_VQ_YAML = """\
MODEL:
  META_ARCHITECTURE: "VQVAEModel"
  INIT_TYPE: "xavier_uniform"
  PIXEL_MEAN: [0.5, 0.5, 0.5]
  PIXEL_STD: [0.5, 0.5, 0.5]
  ENCODER:
    NAME: "ResEncoder"
    IN_CHANNELS: 3
    NF: 16
    RES_CHANNELS: 8
    N_LAYERS: 1
  GENERATOR:
    NAME: "ResDecoder"
    IN_CHANNELS: 16
    NF: 16
    RES_CHANNELS: 8
    N_LAYERS: 1
    OUT_CHANNELS: 3
    OUT_ACTIVATION: "tanh"
  CODEBOOK:
    NUM: 4
    SIZE: 16
    DIM: 16
    EMA: True
INPUT:
  FORMAT: "RGB"
"""


def test_vt_sampler_writes_samples(rng, tmp_path):
    # paired tiny VQ-VAE config on disk
    vq_cfg_path = str(tmp_path / "tiny_vq.yaml")
    with open(vq_cfg_path, "w") as f:
        f.write(TINY_VQ_YAML)

    # latent dataset: 2 videos of 8 frames, codes in [0, 16)
    codes_root = str(tmp_path / "lat")
    for v in range(2):
        d = os.path.join(codes_root, f"video_{v}")
        os.makedirs(d)
        for t in range(8):
            np.save(os.path.join(d, f"{t}.npy"),
                    rng.integers(0, 16, size=(4, 8, 8)).astype(np.int64))

    name = "vt_sampler_toy"
    if name in DatasetCatalog.list():
        DatasetCatalog._REGISTERED.pop(name)
    DatasetCatalog.register(name, lambda: get_latent_video_paths(codes_root, use_cache=False))
    MetadataCatalog.get(name).set(root=codes_root)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 4, 16
    v.KERNEL, v.STRIDE = (3, 1, 1), (8, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 8, 8),) * 1
    v.N_HEAD_E = (2,)
    v.BLOCKS_D = ((1, 8, 8),) * 1
    v.N_HEAD_D = (2,)
    v.N_PRIME = 1
    v.SHARE_P = False
    cfg.INPUT.SCALE_TO_ZEROONE = False
    cfg.INPUT.N_FRAMES_PER_VIDEO_TEST = 8
    cfg.DATASETS.TEST = (name,)
    cfg.TEST.EVALUATORS = "VTSampler"
    cfg.TEST.VT_SAMPLER.VQ_VAE.CFG = vq_cfg_path
    cfg.TEST.VT_SAMPLER.N_PRIME = 2
    cfg.TEST.VT_SAMPLER.NUM_SAMPLES = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    model = VideoTransformer(cfg, T=8, H=8, W=8)
    params, state = model.init(jax.random.key(0))
    results = run_test(cfg, model, params, state)
    assert "samples" in results

    base = os.path.join(cfg.OUTPUT_DIR, "inference", "samples", name)
    # num_samples=2 x 2 videos
    for sample_idx in range(2):
        for v_idx in range(2):
            d = os.path.join(base, f"video_{sample_idx}_{v_idx}")
            assert os.path.isdir(d), d
            codes = np.load(os.path.join(d, "codes.npy"))
            assert codes.shape == (4, 8, 8, 8)  # (nc, T, h, w)
            pngs = [f for f in os.listdir(d) if f.endswith(".png")]
            assert len(pngs) == 8
