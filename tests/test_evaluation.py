"""End-to-end evaluation pipeline tests: VQ-VAE inference -> MSE +
CodesExtractor (exact directory layout) -> latent dataset -> VT bits/dim.
Mirrors the reference's stage-1 -> stage-2 bridge (SURVEY.md §3.2)."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from lvt_tpu.config import get_cfg
from lvt_tpu.data.build import build_test_loader
from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvt_tpu.data.datasets.latents import get_latent_video_paths
from lvt_tpu.engine.defaults import build_evaluators, build_vqvae_infer_fn, build_vt_infer_fn, run_test
from lvt_tpu.evaluation import inference_on_dataset
from lvt_tpu.evaluation.testing import flatten_results_dict, verify_results
from lvt_tpu.models.vqvae import VQVAE
from lvt_tpu.models.vt import VideoTransformer

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _vq_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    cfg.MODEL.ENCODER.NF = 16
    cfg.MODEL.ENCODER.RES_CHANNELS = 8
    cfg.MODEL.ENCODER.N_LAYERS = 1
    cfg.MODEL.GENERATOR.NF = 16
    cfg.MODEL.GENERATOR.RES_CHANNELS = 8
    cfg.MODEL.GENERATOR.N_LAYERS = 1
    cfg.MODEL.GENERATOR.IN_CHANNELS = 16
    cfg.MODEL.CODEBOOK.DIM = 16
    cfg.INPUT.N_FRAMES_PER_VIDEO_TEST = 8
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


def _make_video_tree(root, n_videos=2, n_frames=8, size=32):
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        d = os.path.join(root, f"video_{v}")
        os.makedirs(d, exist_ok=True)
        for f in range(n_frames):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{f}.png"))


def _register(name, fn):
    if name in DatasetCatalog.list():
        DatasetCatalog._REGISTERED.pop(name)
    DatasetCatalog.register(name, fn)


def test_stage1_to_stage2_bridge(rng, tmp_path):
    # ---- stage 1: VQ-VAE inference with MSE + CodesExtractor
    video_root = str(tmp_path / "vids")
    _make_video_tree(video_root)
    from lvt_tpu.utils.image import get_video_paths

    _register("toy_videos_seq", lambda: get_video_paths(video_root, use_cache=False))
    MetadataCatalog.get("toy_videos_seq").set(root=video_root)

    cfg = _vq_cfg(tmp_path)
    cfg.DATASETS.TEST = ("toy_videos_seq",)
    cfg.TEST.EVALUATORS = "MSEEvaluator,CodesExtractor"

    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    results = run_test(cfg, model, params, state)

    assert "reconstruction" in results and "MSE" in results["reconstruction"]
    assert np.isfinite(results["reconstruction"]["MSE"])

    # CodesExtractor layout: OUTPUT_DIR/inference/<dataset>/video_<idx>/<frame>.npy
    codes_root = os.path.join(cfg.OUTPUT_DIR, "inference", "toy_videos_seq")
    assert os.path.isdir(os.path.join(codes_root, "video_0"))
    code0 = np.load(os.path.join(codes_root, "video_0", "0.npy"))
    assert code0.shape == (4, 8, 8)  # (nc, h, w) at 32/4 = 8
    assert code0.dtype in (np.int32, np.int64)
    assert len(os.listdir(os.path.join(codes_root, "video_0"))) == 8

    # ---- stage 2: latent dataset -> VT bits/dim
    _register("toy_latents", lambda: get_latent_video_paths(codes_root, use_cache=False))
    MetadataCatalog.get("toy_latents").set(root=codes_root)

    vt_cfg = get_cfg()
    vt_cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    vt_cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = vt_cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 4, 512
    v.KERNEL, v.STRIDE = (3, 1, 1), (8, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 8, 8),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 8, 8),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.SHARE_P = False
    vt_cfg.INPUT.SCALE_TO_ZEROONE = False
    vt_cfg.INPUT.N_FRAMES_PER_VIDEO_TEST = 8
    vt_cfg.DATASETS.TEST = ("toy_latents",)
    vt_cfg.TEST.EVALUATORS = "BitsEvaluator"
    vt_cfg.OUTPUT_DIR = str(tmp_path / "vt_out")

    vt = VideoTransformer(vt_cfg, T=8, H=8, W=8)
    vt_params, vt_state = vt.init(jax.random.key(1))
    vt_results = run_test(vt_cfg, vt, vt_params, vt_state)
    bpd = vt_results["likelihood"]["bits_per_dim"]
    # random init -> bits/dim near log2(512) = 9
    assert 7.0 < bpd < 11.0, bpd


def test_verify_results_gate(tmp_path):
    cfg = get_cfg()
    cfg.TEST.EXPECTED_RESULTS = [["reconstruction", "MSE", 0.5, 0.1]]
    ok = verify_results(cfg, {"reconstruction": {"MSE": 0.55}})
    assert ok
    with pytest.raises(SystemExit):
        verify_results(cfg, {"reconstruction": {"MSE": 0.9}})


def test_flatten_results():
    assert flatten_results_dict({"a": {"b": 1, "c": {"d": 2}}, "e": 3}) == {
        "a/b": 1, "a/c/d": 2, "e": 3}
