"""tools/convert_i3d.py: checkpoint -> i3d.py npz schema (VERDICT r2 #3).

Fabricates checkpoints in both supported source formats from init_i3d's own
schema (no 300 MB download needed), round-trips them through the converter,
and checks the gamma-folding math against direct batch-norm computation."""
import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvt_tpu.evaluation.i3d import i3d_apply, init_i3d, load_i3d_npz

_spec = importlib.util.spec_from_file_location(
    "convert_i3d",
    os.path.join(os.path.dirname(__file__), "..", "tools", "convert_i3d.py"))
conv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(conv)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


@pytest.fixture(scope="module")
def ref_flat():
    return _flatten(init_i3d(jax.random.key(3)))


def _fake_tf_dump(flat):
    """Inverse of convert_tf_npz: canonical tree -> TF variable names."""
    dump = {"global_step": np.asarray(0)}  # junk the converter must skip
    for key, arr in flat.items():
        if key == "Logits/w":
            dump[conv.TF_PREFIX + "Logits/Conv3d_0c_1x1/conv_3d/w"] = arr
        elif key == "Logits/b":
            dump[conv.TF_PREFIX + "Logits/Conv3d_0c_1x1/conv_3d/b"] = arr
        else:
            unit, leaf = key.rsplit("/", 1)
            # reproduce the canonical checkpoint's naming quirk (the real
            # deepmind dump calls Mixed_5b's second Branch_2 conv
            # 'Conv3d_0a_3x3') so the converter's alias is exercised
            unit = unit.replace("Mixed_5b/Branch_2/Conv3d_0b_3x3",
                                "Mixed_5b/Branch_2/Conv3d_0a_3x3")
            if leaf == "w":
                dump[conv.TF_PREFIX + unit + "/conv_3d/w"] = arr
            else:
                tf_leaf = {"beta": "beta", "mean": "moving_mean",
                           "var": "moving_variance"}[leaf]
                # sonnet stores BN vars (1, 1, 1, 1, C)
                dump[conv.TF_PREFIX + unit + "/batch_norm/" + tf_leaf] = \
                    arr.reshape(1, 1, 1, 1, -1)
    return dump


def _fake_torch_state(flat, gamma_tables=None):
    """Inverse of convert_torch: canonical tree -> pytorch-i3d names/layouts."""
    inv_branch = {v: k for k, v in conv.TORCH_BRANCHES.items()}
    state = {}
    for key, arr in flat.items():
        if key == "Logits/w":
            state["logits.conv3d.weight"] = arr.transpose(4, 3, 0, 1, 2)
            continue
        if key == "Logits/b":
            state["logits.conv3d.bias"] = arr
            continue
        unit, leaf = key.rsplit("/", 1)
        parts = unit.split("/")
        if len(parts) == 3:  # Mixed_xx/Branch_n/Conv3d_...
            tname = f"{parts[0]}.{inv_branch[(parts[1], parts[2])]}"
        else:
            tname = parts[0]
        if leaf == "w":
            state[tname + ".conv3d.weight"] = arr.transpose(4, 3, 0, 1, 2)
        else:
            gamma = (gamma_tables or {}).get(unit)
            c = arr.shape[-1]
            state.setdefault(tname + ".bn.weight",
                             gamma if gamma is not None else np.ones(c, np.float32))
            tleaf = {"beta": "bn.bias", "mean": "bn.running_mean",
                     "var": "bn.running_var"}[leaf]
            state[tname + "." + tleaf] = arr
    return state


@pytest.mark.slow
def test_tf_npz_roundtrip(ref_flat, tmp_path):
    dump = _fake_tf_dump(ref_flat)
    out = conv.convert_tf_npz(dump)
    conv.validate(out)
    path = str(tmp_path / "i3d.npz")
    np.savez(path, **out)
    tree = load_i3d_npz(path)
    back = _flatten(tree)
    assert set(back) == set(ref_flat)
    for k in ref_flat:
        np.testing.assert_array_equal(back[k], ref_flat[k], err_msg=k)
    # and the loaded tree actually runs
    logits = i3d_apply(tree, jnp.zeros((1, 8, 32, 32, 3)))
    assert logits.shape == (1, 400) and bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.slow
def test_torch_roundtrip_unit_gamma(ref_flat):
    out = conv.convert_torch(_fake_torch_state(ref_flat))
    conv.validate(out)
    for k in ref_flat:
        np.testing.assert_allclose(out[k], ref_flat[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)


def test_torch_gamma_fold_exact():
    """BN with gamma != 1 (pytorch-i3d checkpoints are affine) must fold into
    i3d_apply's fixed-eps beta-only normalization exactly."""
    rng = np.random.default_rng(0)
    c = 16
    gamma = rng.uniform(0.5, 2.0, c).astype(np.float32)
    beta = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.1, 3.0, c).astype(np.float32)
    eps_src = 1e-3
    x = rng.normal(size=(4, c)).astype(np.float32)

    torch_out = (x - mean) / np.sqrt(var + eps_src) * gamma + beta

    beta2, mean2, var_eff = conv._fold_bn(gamma, beta, mean, var, eps_src)
    ours = (x - mean2) / np.sqrt(var_eff + conv.EPS_I3D) + beta2
    np.testing.assert_allclose(ours, torch_out, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_torch_gamma_fold_through_converter(ref_flat):
    """End-to-end: a gamma-bearing state dict converts to a tree whose
    normalized output matches the torch math on a probe unit."""
    rng = np.random.default_rng(1)
    unit = "Conv3d_1a_7x7"
    gamma = rng.uniform(0.5, 2.0, 64).astype(np.float32)
    state = _fake_torch_state(ref_flat, gamma_tables={unit: gamma})
    out = conv.convert_torch(state)
    conv.validate(out)
    y = rng.normal(size=(2, 64)).astype(np.float32)
    want = (y - ref_flat[unit + "/mean"]) / np.sqrt(
        ref_flat[unit + "/var"] + conv.EPS_I3D) * gamma + ref_flat[unit + "/beta"]
    got = (y - out[unit + "/mean"]) / np.sqrt(
        out[unit + "/var"] + conv.EPS_I3D) + out[unit + "/beta"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_validate_rejects_missing_and_bad_shape(ref_flat):
    broken = dict(ref_flat)
    del broken["Mixed_5c/Branch_3/Conv3d_0b_1x1/var"]
    with pytest.raises(ValueError, match="missing"):
        conv.validate(broken)
    broken = dict(ref_flat)
    broken["Logits/b"] = np.zeros(401, np.float32)
    with pytest.raises(ValueError, match="shape"):
        conv.validate(broken)


@pytest.mark.slow
def test_converted_weights_drive_real_fvd_eval(ref_flat, tmp_path):
    """Full north-star chain: fabricated TF dump -> convert_i3d -> run_test
    (the train_net --eval-only core) with FVDEvaluator reports plain `FVD`,
    not FVD_stub."""
    from lvt_tpu.config import get_cfg
    from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from lvt_tpu.data.datasets.latents import get_latent_video_paths
    from lvt_tpu.engine.defaults import run_test
    from lvt_tpu.models.vt import VideoTransformer

    # convert fabricated TF-named weights
    out = conv.convert_tf_npz(_fake_tf_dump(ref_flat))
    conv.validate(out)
    wpath = str(tmp_path / "i3d.npz")
    np.savez(wpath, **out)

    vq_yaml = """\
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
    vq_cfg_path = str(tmp_path / "tiny_vq.yaml")
    with open(vq_cfg_path, "w") as f:
        f.write(vq_yaml)

    rng = np.random.default_rng(0)
    codes_root = str(tmp_path / "lat")
    for v in range(3):
        d = os.path.join(codes_root, f"video_{v}")
        os.makedirs(d)
        for t in range(8):
            np.save(os.path.join(d, f"{t}.npy"),
                    rng.integers(0, 16, size=(4, 8, 8)).astype(np.int64))

    name = "fvd_i3d_toy"
    if name in DatasetCatalog.list():
        DatasetCatalog._REGISTERED.pop(name)
    DatasetCatalog.register(
        name, lambda: get_latent_video_paths(codes_root, use_cache=False))
    MetadataCatalog.get(name).set(root=codes_root)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 4, 16
    v.KERNEL, v.STRIDE = (3, 1, 1), (8, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 8, 8),)
    v.N_HEAD_E = (2,)
    v.BLOCKS_D = ((1, 8, 8),)
    v.N_HEAD_D = (2,)
    v.N_PRIME = 1
    v.SHARE_P = False
    cfg.INPUT.SCALE_TO_ZEROONE = False
    cfg.INPUT.N_FRAMES_PER_VIDEO_TEST = 8
    cfg.DATASETS.TEST = (name,)
    cfg.TEST.EVALUATORS = "FVDEvaluator"
    cfg.TEST.VT_SAMPLER.VQ_VAE.CFG = vq_cfg_path
    cfg.TEST.VT_SAMPLER.N_PRIME = 2
    cfg.TEST.VT_SAMPLER.NUM_SAMPLES = 1
    cfg.TEST.FVD.I3D_WEIGHTS = wpath
    cfg.TEST.FVD.RESIZE = 32  # keep the CPU conv stack small
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    model = VideoTransformer(cfg, T=8, H=8, W=8)
    params, state = model.init(jax.random.key(0))
    results = run_test(cfg, model, params, state)
    gen = results["generation"]
    assert "FVD" in gen and "FVD_stub" not in gen
    assert np.isfinite(gen["FVD"]) and gen["FVD"] >= 0


@pytest.mark.slow
def test_cli_end_to_end(ref_flat, tmp_path):
    src = str(tmp_path / "dump.npz")
    np.savez(src, **_fake_tf_dump(ref_flat))
    out = str(tmp_path / "i3d.npz")
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools", "convert_i3d.py"),
         "--src", src, "--out", out],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "400" in r.stdout or os.path.exists(out)
    tree = load_i3d_npz(out)
    assert _flatten(tree).keys() == ref_flat.keys()


def test_fold_bn_rejects_nonpositive_gamma():
    """The variance fold squares gamma (sign lost): non-positive gammas
    must refuse conversion instead of silently sign-flipping channels."""
    c = 4
    good = np.ones(c, np.float32)
    for bad_val in (0.0, -0.5):
        gamma = good.copy()
        gamma[1] = bad_val
        with pytest.raises(ValueError, match="gamma"):
            conv._fold_bn(gamma, np.zeros(c), np.zeros(c), np.ones(c),
                          conv.EPS_I3D)
