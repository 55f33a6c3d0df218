"""CLI integration: tools/train_net.py runs a tiny train then --eval-only on
a toy on-disk dataset via subprocess — the full user-facing path."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.join(os.path.dirname(__file__), "..")

TOY_CFG = """\
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
  N_FRAMES_PER_VIDEO_TEST: 4
SOLVER:
  IMS_PER_BATCH: 8
  MAX_ITER: 3
  CHECKPOINT_PERIOD: 3
TEST:
  EVALUATORS: "MSEEvaluator,CodesExtractor"
"""



def test_train_net_cli_roundtrip(tmp_path):
    # toy dataset tree
    root = tmp_path / "datasets" / "toy" / "train"
    rng = np.random.default_rng(0)
    for v in range(4):
        d = root / f"video_{v}"
        d.mkdir(parents=True)
        for f in range(4):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(d / f"{f}.png")

    cfg_path = tmp_path / "toy.yaml"
    cfg_path.write_text(TOY_CFG)

    # register the toy dataset through a sitecustomize-style driver script
    driver = tmp_path / "run.py"
    driver.write_text(f"""\
import sys
sys.path.insert(0, {str(REPO)!r})
sys.argv = ["train_net.py"] + sys.argv[1:]
import jax
jax.config.update("jax_platforms", "cpu")
from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvt_tpu.utils.image import get_video_paths
DatasetCatalog.register("toy_train_seq", lambda: get_video_paths({str(root)!r}, use_cache=False))
MetadataCatalog.get("toy_train_seq").set(root={str(root)!r})
import runpy
runpy.run_path({str(os.path.join(REPO, "tools", "train_net.py"))!r}, run_name="__main__")
""")

    env = dict(os.environ)
    out_dir = str(tmp_path / "out")
    opts = ["OUTPUT_DIR", out_dir,
            "DATASETS.TRAIN", "('toy_train_seq',)",
            "DATASETS.TEST", "('toy_train_seq',)"]
    common = [sys.executable, str(driver), "--config-file", str(cfg_path)]

    r = subprocess.run(common + opts, capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))

    r = subprocess.run(common + ["--eval-only"] + opts, capture_output=True, text=True,
                      timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    codes_dir = os.path.join(out_dir, "inference", "toy_train_seq")
    assert os.path.isdir(codes_dir)
    code = np.load(os.path.join(codes_dir, "video_0", "0.npy"))
    assert code.shape == (4, 8, 8)
