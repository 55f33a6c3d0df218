"""A tiny functional sequential-conv framework for the 2D VQ-VAE nets.

Architectures are static descriptor lists built from the config; ``init_seq``
materializes a params/state pytree, ``apply_seq`` runs it. Channels-last
(NHWC). This replaces the reference's nn.Sequential stacks
(vidgen/modeling/encoder/*.py, generator/*.py) with jit-friendly pure
functions.

Descriptor forms:
  ("conv", cin, cout, k, stride, pad)
  ("convT", cin, cout, k, stride, pad)       # transposed conv
  ("relu",) ("lrelu", slope) ("tanh",) ("sigmoid",)
  ("avgpool", k) ("upsample", factor) ("pixelshuffle", factor)
  ("resblock", dim, dim_res)                  # ReLU-conv3-ReLU-conv1 residual
  ("norm",)                                   # attached to preceding conv

Reference quirk preserved: ``norm_layer`` deletes the conv bias when a norm
follows (vidgen/layers/wrappers.py:48-50) — here a conv followed by a norm is
created biasless.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d, conv_transpose2d
from .norms import apply_norm, init_norm


def _xavier_uniform(key, shape, fan_in, fan_out):
    lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -lim, lim)


def _normal_init(key, shape, flat_in):
    # reference init_type="normal": std = 1/sqrt((1+slope^2) * prod(shape[:-1]))
    # with slope=0.2 (meta_arch/ae.py:46-48)
    std = 1.0 / float(np.sqrt((1 + 0.2 ** 2) * flat_in))
    return jax.random.normal(key, shape, jnp.float32) * std


def init_conv_weight(key, k, cin, cout, init_type: str, transposed=False):
    """HWIO (or HW-out-in for convT) weight with torch-equivalent fan
    computation: Conv2d fan_in=cin*k^2/fan_out=cout*k^2; ConvTranspose2d
    swaps them (torch weight layouts (out,in,k,k) vs (in,out,k,k))."""
    shape = (k, k, cout, cin) if transposed else (k, k, cin, cout)
    if init_type == "xavier_uniform":
        fan_in, fan_out = (cout * k * k, cin * k * k) if transposed else (cin * k * k, cout * k * k)
        return _xavier_uniform(key, shape, fan_in, fan_out)
    elif init_type == "normal":
        # torch weight shape[:-1] flattening: (out, in, kh) for conv
        flat = (cin * cout * k) if transposed else (cout * cin * k)
        return _normal_init(key, shape, flat)
    else:
        raise ValueError(init_type)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _upsample_nearest(x, f):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, f, w, f, c))
    return x.reshape(b, h * f, w * f, c)


def _pixel_shuffle(x, r):
    """(b, h, w, c*r*r) -> (b, h*r, w*r, c), matching torch.nn.PixelShuffle
    channel order (c, r, r) in torch's NCHW -> channels-last equivalent."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def _spectral_normalize(w, u, train, out_axis: int = -1):
    """One power-iteration spectral norm (torch.nn.utils.spectral_norm
    semantics; reference wrappers.py:44-46). w viewed as (out, -1) in torch;
    our HWIO conv maps out = last dim, our HWOI convT maps out = axis 2
    (torch uses dim=1 = out for ConvTranspose2d). sigma is invariant to the
    column (rest-dims) ordering, so any reshape with rows = out-channels
    matches torch's (out, -1) view."""
    if out_axis not in (-1, w.ndim - 1):
        w_view = jnp.moveaxis(w, out_axis, -1)
    else:
        w_view = w
    wm = w_view.reshape(-1, w_view.shape[-1]).T  # (out, rest)
    v = wm.T @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = wm @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    u_used = jax.lax.stop_gradient(u_new) if train else u
    sigma = u_used @ (wm @ jax.lax.stop_gradient(v))
    return w / sigma, (u_new if train else u)


def init_seq(key, spec: List[Tuple], init_type: str, norm: str, use_spectral: bool):
    """Build (params, state) for a descriptor list."""
    params: List[Dict[str, Any]] = []
    state: List[Dict[str, Any]] = []
    spec = list(spec)
    for i, layer in enumerate(spec):
        kind = layer[0]
        key, sub = jax.random.split(key)
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        if kind in ("conv", "convT"):
            _, cin, cout, k, stride, pad = layer
            followed_by_norm = i + 1 < len(spec) and spec[i + 1][0] == "norm"
            p["w"] = init_conv_weight(sub, k, cin, cout, init_type, transposed=(kind == "convT"))
            if not followed_by_norm:
                p["b"] = jnp.zeros((cout,))
            if use_spectral:
                key, ku = jax.random.split(key)
                s["u"] = jax.random.normal(ku, (cout,))
        elif kind == "norm":
            cout = _prev_out_channels(spec, i)
            p, s = init_norm(norm, cout)
        elif kind == "resblock":
            _, dim, dim_res = layer
            k1, k2, k3, k4 = jax.random.split(sub, 4)
            has_norm = norm != ""
            p["w1"] = init_conv_weight(k1, 3, dim, dim_res, init_type)
            p["w2"] = init_conv_weight(k2, 1, dim_res, dim, init_type)
            if not has_norm:
                p["b1"] = jnp.zeros((dim_res,))
                p["b2"] = jnp.zeros((dim,))
            else:
                pn1, sn1 = init_norm(norm, dim_res)
                pn2, sn2 = init_norm(norm, dim)
                p["n1"], p["n2"] = pn1, pn2
                s["n1"], s["n2"] = sn1, sn2
            if use_spectral:
                s["u1"] = jax.random.normal(k3, (dim_res,))
                s["u2"] = jax.random.normal(k4, (dim,))
        params.append(p)
        state.append(s)
    return params, state


def _prev_out_channels(spec, i):
    for j in range(i - 1, -1, -1):
        if spec[j][0] in ("conv", "convT"):
            return spec[j][2]
        if spec[j][0] == "resblock":
            return spec[j][1]
    raise ValueError("norm with no preceding conv")


def apply_seq(spec, params, state, x, *, norm: str, use_spectral: bool,
              train: bool, axis_name: Optional[str] = None):
    new_state = []
    for layer, p, s in zip(spec, params, state):
        kind = layer[0]
        ns = s
        if kind in ("conv", "convT"):
            _, cin, cout, k, stride, pad = layer
            w = p["w"]
            if use_spectral:
                w, u = _spectral_normalize(
                    w, s["u"], train, out_axis=2 if kind == "convT" else -1)
                ns = dict(s, u=u)
            b = p.get("b")
            if kind == "conv":
                x = conv2d(x, w, b, stride=stride, padding=pad)
            else:
                x = conv_transpose2d(x, w, b, stride=stride, padding=pad)
        elif kind == "norm":
            x, ns = apply_norm(norm, p, s, x, train, axis_name=axis_name)
        elif kind == "resblock":
            _, dim, dim_res = layer
            # NOTE: the reference ResBlock computes `x + self.block(x)` where
            # block starts with an *in-place* ReLU (resencoder.py:13-21) — the
            # inplace op mutates x before the residual add, so the actual
            # semantics (and what trained checkpoints encode) are
            # relu(x) + conv1(relu(conv3(relu(x)))). We reproduce that.
            r = jax.nn.relu(x)
            w1, w2 = p["w1"], p["w2"]
            ns = dict(s)
            if use_spectral:
                w1, u1 = _spectral_normalize(w1, s["u1"], train)
                w2, u2 = _spectral_normalize(w2, s["u2"], train)
                ns["u1"], ns["u2"] = u1, u2
            y = conv2d(r, w1, p.get("b1"), stride=1, padding=1)
            if "n1" in p:
                y, ns["n1"] = apply_norm(norm, p["n1"], s["n1"], y, train, axis_name=axis_name)
            y = jax.nn.relu(y)
            y = conv2d(y, w2, p.get("b2"), stride=1, padding=0)
            if "n2" in p:
                y, ns["n2"] = apply_norm(norm, p["n2"], s["n2"], y, train, axis_name=axis_name)
            x = r + y
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "lrelu":
            x = jax.nn.leaky_relu(x, layer[1])
        elif kind == "tanh":
            x = jnp.tanh(x)
        elif kind == "sigmoid":
            x = jax.nn.sigmoid(x)
        elif kind == "avgpool":
            x = _avg_pool(x, layer[1])
        elif kind == "upsample":
            x = _upsample_nearest(x, layer[1])
        elif kind == "pixelshuffle":
            x = _pixel_shuffle(x, layer[1])
        else:
            raise ValueError(f"Unknown layer kind {kind}")
        new_state.append(ns)
    return x, new_state


def out_activation_spec(name: str) -> List[Tuple]:
    if name == "":
        return []
    if name == "sigmoid":
        return [("sigmoid",)]
    if name == "relu":
        return [("relu",)]
    if name == "tanh":
        return [("tanh",)]
    raise ValueError(f"Unknown out_activation {name}")
