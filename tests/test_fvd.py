"""FVD evaluator (VERDICT round-1 missing #3): Fréchet math against closed
forms, the I3D architecture contract, and the full evaluator pipeline with
the stub feature net."""

import os

import jax
import numpy as np
import pytest

from lvt_tpu.evaluation.fvd import (
    FVDEvaluator,
    frechet_distance,
    fvd_from_features,
    gaussian_stats,
    make_stub_features,
)

# --------------------------------------------------------------------------
# Fréchet math
# --------------------------------------------------------------------------

def test_frechet_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(200, 16))
    assert abs(fvd_from_features(feats, feats.copy())) < 1e-8


def test_frechet_matches_diagonal_closed_form():
    """For diagonal covariances: |mu1-mu2|^2 + sum(s1 + s2 - 2 sqrt(s1 s2))."""
    rng = np.random.default_rng(1)
    d = 8
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    s1, s2 = rng.uniform(0.5, 2.0, d), rng.uniform(0.5, 2.0, d)
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    want = np.sum((mu1 - mu2) ** 2) + np.sum(s1 + s2 - 2 * np.sqrt(s1 * s2))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_frechet_mean_shift_only():
    """Equal covariances: FVD == |mu1 - mu2|^2 exactly."""
    rng = np.random.default_rng(2)
    d = 5
    a = rng.normal(size=(d, d))
    sigma = a @ a.T + np.eye(d)
    mu1, mu2 = np.zeros(d), np.full(d, 3.0)
    np.testing.assert_allclose(
        frechet_distance(mu1, sigma, mu2, sigma), 9.0 * d, rtol=1e-9)


def test_frechet_decreases_as_distributions_approach():
    rng = np.random.default_rng(3)
    real = rng.normal(size=(300, 12))
    far = rng.normal(loc=5.0, size=(300, 12))
    near = rng.normal(loc=0.5, size=(300, 12))
    assert fvd_from_features(real, near) < fvd_from_features(real, far)


def test_gaussian_stats_shapes():
    mu, sigma = gaussian_stats(np.random.default_rng(0).normal(size=(50, 7)))
    assert mu.shape == (7,) and sigma.shape == (7, 7)


# --------------------------------------------------------------------------
# feature networks
# --------------------------------------------------------------------------

def test_stub_features_deterministic():
    f = make_stub_features(dim=32)
    v = np.random.default_rng(0).uniform(0, 255, (2, 4, 16, 16, 3))
    a, b = np.asarray(f(v)), np.asarray(make_stub_features(dim=32)(v))
    assert a.shape == (2, 32)
    np.testing.assert_array_equal(a, b)


def test_i3d_architecture_contract():
    """Random-init I3D maps (b, 16, 64, 64, 3) in [-1,1] -> (b, 400); the
    param tree uses the canonical TF-Hub unit paths so converted Kinetics
    weights slot in (load_i3d_npz round-trip included)."""
    from lvt_tpu.evaluation.i3d import i3d_apply, init_i3d, load_i3d_npz

    params = init_i3d(jax.random.key(0))
    assert params["Conv3d_1a_7x7"]["w"].shape == (7, 7, 7, 3, 64)
    assert params["Mixed_3b"]["Branch_1"]["Conv3d_0b_3x3"]["w"].shape[-1] == 128
    assert params["Logits"]["w"].shape == (1, 1, 1, 1024, 400)

    v = np.random.default_rng(0).uniform(-1, 1, (1, 16, 64, 64, 3)).astype(np.float32)
    out = jax.jit(i3d_apply)(params, v)
    assert out.shape == (1, 400)
    assert np.all(np.isfinite(out))


def test_i3d_npz_roundtrip(tmp_path):
    from lvt_tpu.evaluation.i3d import init_i3d, load_i3d_npz

    params = init_i3d(jax.random.key(1))
    flat = {}

    def flatten(node, prefix=""):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    flatten(params)
    path = str(tmp_path / "i3d.npz")
    np.savez(path, **flat)
    loaded = load_i3d_npz(path)
    np.testing.assert_array_equal(
        loaded["Mixed_5c"]["Branch_0"]["Conv3d_0a_1x1"]["w"],
        params["Mixed_5c"]["Branch_0"]["Conv3d_0a_1x1"]["w"])


# --------------------------------------------------------------------------
# evaluator pipeline
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
    DIM: 8
    EMA: True
INPUT:
  FORMAT: "RGB"
"""


def test_fvd_evaluator_pipeline(tmp_path):
    from lvt_tpu.config import get_cfg

    vq_path = tmp_path / "vq.yaml"
    vq_path.write_text(VQ_CFG)
    cfg = get_cfg()
    cfg.TEST.VT_SAMPLER.VQ_VAE.CFG = str(vq_path)

    ev = FVDEvaluator(cfg, "toy", distributed=False)
    assert ev._metric == "FVD_stub"  # no I3D weights configured

    rng = np.random.default_rng(0)
    nc, T, h, w = 2, 4, 4, 4

    def batch(n, seed):
        r = np.random.default_rng(seed)
        inputs = [{"video": r.integers(0, 8, (nc, T, h, w)), "video_idx": i}
                  for i in range(n)]
        outputs = [{"samples": [r.integers(0, 8, (nc, T, h, w))
                                for _ in range(2)]} for _ in range(n)]
        return inputs, outputs

    ev.process(*batch(3, 1))
    ev.process(*batch(3, 2))
    res = ev.evaluate()
    val = res["generation"]["FVD_stub"]
    assert np.isfinite(val) and val >= 0

    # identical real and fake codes -> (near) zero distance
    ev.reset()
    inputs, _ = batch(4, 3)
    outputs = [{"samples": [inp["video"].copy()]} for inp in inputs]
    ev.process(inputs, outputs)
    res0 = ev.evaluate()["generation"]["FVD_stub"]
    assert abs(res0) < 1e-6

    # too few videos -> nan + warning, not a crash
    ev.reset()
    ev.process(*batch(1, 4))
    assert np.isnan(ev.evaluate()["generation"]["FVD_stub"])


def test_fvd_evaluator_with_i3d_weights(tmp_path):
    """The real-weights path: an .npz in the canonical schema loads through
    TEST.FVD.I3D_WEIGHTS and the metric is labeled plain FVD."""
    from lvt_tpu.config import get_cfg
    from lvt_tpu.evaluation.i3d import init_i3d

    # save random-init weights in the schema load_i3d_npz expects
    params = init_i3d(jax.random.key(2))
    flat = {}

    def flatten(node, prefix=""):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    flatten(params)
    wpath = str(tmp_path / "i3d.npz")
    np.savez(wpath, **flat)

    vq_path = tmp_path / "vq.yaml"
    vq_path.write_text(VQ_CFG)
    cfg = get_cfg()
    cfg.TEST.VT_SAMPLER.VQ_VAE.CFG = str(vq_path)
    cfg.TEST.FVD.I3D_WEIGHTS = wpath
    cfg.TEST.FVD.RESIZE = 32  # keep the CPU conv stack small

    ev = FVDEvaluator(cfg, "toy", distributed=False)
    assert ev._metric == "FVD"  # real network path, not the stub

    r = np.random.default_rng(0)
    nc, T, h, w = 2, 4, 4, 4
    inputs = [{"video": r.integers(0, 8, (nc, T, h, w)), "video_idx": i}
              for i in range(3)]
    outputs = [{"samples": [r.integers(0, 8, (nc, T, h, w))]}
               for _ in range(3)]
    ev.process(inputs, outputs)
    val = ev.evaluate()["generation"]["FVD"]
    assert np.isfinite(val) and val >= 0


def test_fvd_real_side_rescales_scale01_frames(tmp_path):
    """With INPUT.SCALE_TO_ZEROONE the mapper delivers [0, 1] frames; the
    evaluator must bring them back to the [0, 255] range the feature net
    (and the VQ-decoded fake side) uses — otherwise real features collapse
    to near-constant and the FVD measures the scaling artifact."""
    from lvt_tpu.config import get_cfg

    vq_path = tmp_path / "vq.yaml"
    vq_path.write_text(VQ_CFG)

    rng = np.random.default_rng(5)
    frames255 = rng.random((4, 8, 8, 3)).astype(np.float32) * 255.0
    video = rng.integers(0, 8, (2, 4, 4, 4))
    out = [{"samples": [video.copy(), video.copy()]}]

    feats = {}
    for scale01 in (False, True):
        cfg = get_cfg()
        cfg.TEST.VT_SAMPLER.VQ_VAE.CFG = str(vq_path)
        cfg.INPUT.SCALE_TO_ZEROONE = scale01
        ev = FVDEvaluator(cfg, "toy", distributed=False)
        seq = frames255 / 255.0 if scale01 else frames255
        ev.process([{"image_sequence": seq, "video": video}], out)
        feats[scale01] = np.stack(ev._real)

    np.testing.assert_allclose(feats[True], feats[False], rtol=1e-5)
