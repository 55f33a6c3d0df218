"""Inflated-3D Inception (I3D, Carreira & Zisserman 2017) — the standard FVD
feature network, implemented as a pure JAX apply over a plain param pytree.

The param schema mirrors the TF-Hub / sonnet variable tree of the canonical
Kinetics-400 RGB checkpoint (`RGB/inception_i3d/...`), so converted weights
(an .npz keyed by the unit paths below) slot straight in. No reference
counterpart: the reference repo has no FVD evaluator at all — this feeds the
FVDEvaluator (evaluation/fvd.py), the paper's headline metric
(arXiv:2006.10704 Table 1).

Every unit is conv3d (no bias) -> batchnorm (beta only, as in the original)
-> relu. Input: (b, T, 224, 224, 3) in [-1, 1]; output: (b, 400) logits.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels, kernel (t,h,w), stride) for the stem;
# inception mixes are (name, in_ch, (b0, b1a, b1b, b2a, b2b, b3))
STEM = [
    ("Conv3d_1a_7x7", 64, (7, 7, 7), (2, 2, 2)),
    ("MaxPool3d_2a_3x3",),
    ("Conv3d_2b_1x1", 64, (1, 1, 1), (1, 1, 1)),
    ("Conv3d_2c_3x3", 192, (3, 3, 3), (1, 1, 1)),
    ("MaxPool3d_3a_3x3",),
]

MIXES = [
    ("Mixed_3b", 192, (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", 256, (128, 128, 192, 32, 96, 64)),
    ("MaxPool3d_4a_3x3", None, None),
    ("Mixed_4b", 480, (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", 512, (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", 512, (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", 512, (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", 528, (256, 160, 320, 32, 128, 128)),
    ("MaxPool3d_5a_2x2", None, None),
    ("Mixed_5b", 832, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", 832, (384, 192, 384, 48, 128, 128)),
]

NUM_CLASSES = 400


def _unit_params(key, in_ch, out_ch, kernel):
    kt, kh, kw = kernel
    fan_in = in_ch * kt * kh * kw
    w = jax.random.truncated_normal(
        key, -2, 2, (kt, kh, kw, in_ch, out_ch)) / np.sqrt(fan_in)
    return {
        "w": w.astype(jnp.float32),
        "beta": jnp.zeros((out_ch,)),
        "mean": jnp.zeros((out_ch,)),
        "var": jnp.ones((out_ch,)),
    }


def _mix_params(keys, in_ch, spec):
    b0, b1a, b1b, b2a, b2b, b3 = spec
    k = iter(keys)
    return {
        "Branch_0": {"Conv3d_0a_1x1": _unit_params(next(k), in_ch, b0, (1, 1, 1))},
        "Branch_1": {
            "Conv3d_0a_1x1": _unit_params(next(k), in_ch, b1a, (1, 1, 1)),
            "Conv3d_0b_3x3": _unit_params(next(k), b1a, b1b, (3, 3, 3)),
        },
        "Branch_2": {
            "Conv3d_0a_1x1": _unit_params(next(k), in_ch, b2a, (1, 1, 1)),
            "Conv3d_0b_3x3": _unit_params(next(k), b2a, b2b, (3, 3, 3)),
        },
        "Branch_3": {"Conv3d_0b_1x1": _unit_params(next(k), in_ch, b3, (1, 1, 1))},
    }


def init_i3d(key) -> Dict[str, Any]:
    """Random-init params in the canonical schema (tests / shape contract)."""
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {}
    in_ch = 3
    for entry in STEM:
        if len(entry) == 1:
            continue
        name, out_ch, kernel, _ = entry
        params[name] = _unit_params(next(keys), in_ch, out_ch, kernel)
        in_ch = out_ch
    for name, mix_in, spec in MIXES:
        if spec is None:
            continue
        params[name] = _mix_params([next(keys) for _ in range(6)], mix_in, spec)
    params["Logits"] = {
        "w": jax.random.normal(next(keys), (1, 1, 1, 1024, NUM_CLASSES)) * 0.01,
        "b": jnp.zeros((NUM_CLASSES,)),
    }
    return params


def load_i3d_npz(path: str) -> Dict[str, Any]:
    """Load converted I3D weights from an .npz keyed 'Mixed_3b/Branch_1/
    Conv3d_0b_3x3/w' etc. (flat keys -> nested tree)."""
    flat = np.load(path)
    tree: Dict[str, Any] = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree


def _conv_bn_relu(x, p, stride, *, relu=True):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # batchnorm with frozen statistics, beta only (original has no gamma)
    y = (y - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-3) + p["beta"]
    return jax.nn.relu(y) if relu else y


def _maxpool(x, window, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + window + (1,), (1,) + stride + (1,),
        "SAME")


def _mix(x, p):
    b0 = _conv_bn_relu(x, p["Branch_0"]["Conv3d_0a_1x1"], (1, 1, 1))
    b1 = _conv_bn_relu(x, p["Branch_1"]["Conv3d_0a_1x1"], (1, 1, 1))
    b1 = _conv_bn_relu(b1, p["Branch_1"]["Conv3d_0b_3x3"], (1, 1, 1))
    b2 = _conv_bn_relu(x, p["Branch_2"]["Conv3d_0a_1x1"], (1, 1, 1))
    b2 = _conv_bn_relu(b2, p["Branch_2"]["Conv3d_0b_3x3"], (1, 1, 1))
    b3 = _maxpool(x, (3, 3, 3), (1, 1, 1))
    b3 = _conv_bn_relu(b3, p["Branch_3"]["Conv3d_0b_1x1"], (1, 1, 1))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_apply(params: Dict[str, Any], video: jnp.ndarray) -> jnp.ndarray:
    """(b, T, 224, 224, 3) in [-1, 1] -> (b, 400) logits (FVD features)."""
    x = video
    x = _conv_bn_relu(x, params["Conv3d_1a_7x7"], (2, 2, 2))
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _conv_bn_relu(x, params["Conv3d_2b_1x1"], (1, 1, 1))
    x = _conv_bn_relu(x, params["Conv3d_2c_3x3"], (1, 1, 1))
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _mix(x, params["Mixed_3b"])
    x = _mix(x, params["Mixed_3c"])
    x = _maxpool(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _mix(x, params[name])
    x = _maxpool(x, (2, 2, 2), (2, 2, 2))
    x = _mix(x, params["Mixed_5b"])
    x = _mix(x, params["Mixed_5c"])
    # canonical I3D head: avg_pool3d (2, 7, 7) VALID stride 1 (NOT a plain
    # temporal mean — sliding window-2 averaging weights endpoint frames
    # 1/2), then the 1x1x1 logits conv, then mean over remaining positions
    t_w = min(2, x.shape[1])
    h_w = min(7, x.shape[2])
    w_w = min(7, x.shape[3])
    window = (1, t_w, h_w, w_w, 1)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, (1,) * 5, "VALID") / float(t_w * h_w * w_w)
    logits = jax.lax.conv_general_dilated(
        x, params["Logits"]["w"], (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + params["Logits"]["b"]
    return jnp.mean(logits, axis=(1, 2, 3))  # (b, 400)
