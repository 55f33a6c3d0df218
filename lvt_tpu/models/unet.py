"""UNet over latent code indices (reference: vidgen/modeling/encoder/unet.py).

Embedding(512, 256) of code indices -> classic 4-level UNet (DoubleConv with
BN, maxpool down, bilinear-upsample up with skip concat) -> 1x1 conv ->
sigmoid. NB: the reference decorates this with @ENCODER_REGISTRY.register()
but never imports the module, so it is unreachable there
(encoder/__init__.py) — we register it for real.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from .encoders import ENCODER_REGISTRY
from .norms import apply_norm, init_norm


def _kaiming(key, k, cin, cout):
    # torch Conv2d default init: kaiming_uniform_(a=sqrt(5)) -> gain
    # sqrt(2/(1+5)) = 1/sqrt(3), bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in)
    # (same bound for the bias)
    fan_in = cin * k * k
    bound = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (k, k, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return w, b


def _init_double_conv(key, cin, cmid, cout):
    k1, k2 = jax.random.split(key)
    w1, b1 = _kaiming(k1, 3, cin, cmid)
    w2, b2 = _kaiming(k2, 3, cmid, cout)
    n1p, n1s = init_norm("BN", cmid)
    n2p, n2s = init_norm("BN", cout)
    return ({"w1": w1, "b1": b1, "w2": w2, "b2": b2, "n1": n1p, "n2": n2p},
            {"n1": n1s, "n2": n2s})


def _apply_double_conv(p, s, x, train):
    x = conv2d(x, p["w1"], p["b1"], stride=1, padding=1)
    x, ns1 = apply_norm("BN", p["n1"], s["n1"], x, train)
    x = jax.nn.relu(x)
    x = conv2d(x, p["w2"], p["b2"], stride=1, padding=1)
    x, ns2 = apply_norm("BN", p["n2"], s["n2"], x, train)
    return jax.nn.relu(x), {"n1": ns1, "n2": ns2}


def _max_pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _interp_matrix_ac(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear-interp matrix: output i
    samples input at i*(n_in-1)/(n_out-1)."""
    if n_in == 1 or n_out == 1:
        pos = np.zeros(n_out)
    else:
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = (pos - i0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), i0] += 1.0 - f
    m[np.arange(n_out), i1] += f
    return m


def _bilinear_up2(x):
    """scale_factor=2 bilinear with align_corners=True (torch semantics:
    corner samples reproduced exactly). jax.image.resize's 'bilinear' is
    half-pixel (align_corners=False), so the interpolation is applied as
    two static matmuls instead — MXU-friendly and exactly torch's weights."""
    b, h, w, c = x.shape
    my = jnp.asarray(_interp_matrix_ac(2 * h, h))
    mx = jnp.asarray(_interp_matrix_ac(2 * w, w))
    return jnp.einsum("Hh,bhwc,Ww->bHWc", my, x, mx)


class UNetNet:
    CHANNELS = [64, 128, 256, 512, 512]  # bilinear: down4 -> 1024//2

    def __init__(self, cfg, **kwargs):
        self.in_channels = 256  # embedding dim
        self.out_channels = cfg.MODEL.ENCODER.OUT_CHANNELS
        self.nv = 512

    def init(self, key):
        keys = iter(jax.random.split(key, 16))
        C = self.CHANNELS
        params: Dict[str, Any] = {
            "emb": jax.random.normal(next(keys), (self.nv, 256)),
        }
        state: Dict[str, Any] = {}
        params["inc"], state["inc"] = _init_double_conv(next(keys), 256, C[0], C[0])
        downs_in = [C[0], C[1], C[2], C[3]]
        downs_out = [C[1], C[2], C[3], C[4]]
        for i, (ci, co) in enumerate(zip(downs_in, downs_out)):
            params[f"down{i+1}"], state[f"down{i+1}"] = _init_double_conv(next(keys), ci, co, co)
        # up blocks (bilinear): DoubleConv(in_ch, out_ch, mid=in_ch//2);
        # concat channels: up1 cat(x4:512, up(x5):512)=1024 -> mid 512 -> out 256
        ups = [(1024, 256, 512), (512, 128, 256), (256, 64, 128), (128, 64, 64)]
        for i, (cin, cout, cmid) in enumerate(ups):
            params[f"up{i+1}"], state[f"up{i+1}"] = _init_double_conv(next(keys), cin, cmid, cout)
        wo, bo = _kaiming(next(keys), 1, 64, self.out_channels)
        params["outc"] = {"w": wo, "b": bo}
        return params, state

    def apply(self, params, state, codes, *, train=False, axis_name=None):
        """codes: (b, h, w) int32 latent indices -> (b, h, w, out) in (0,1)."""
        x = jnp.take(params["emb"], codes, axis=0)  # (b, h, w, 256)
        ns: Dict[str, Any] = {}
        x1, ns["inc"] = _apply_double_conv(params["inc"], state["inc"], x, train)
        feats = [x1]
        xk = x1
        for i in range(1, 5):
            xk = _max_pool2(xk)
            xk, ns[f"down{i}"] = _apply_double_conv(params[f"down{i}"], state[f"down{i}"], xk, train)
            feats.append(xk)
        x5 = feats[4]
        x = x5
        for i, skip in enumerate([feats[3], feats[2], feats[1], feats[0]]):
            x = _bilinear_up2(x)
            # pad to skip's spatial size (reference F.pad centering)
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                x = jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2),
                                (dw // 2, dw - dw // 2), (0, 0)))
            x = jnp.concatenate([skip, x], axis=-1)
            x, ns[f"up{i+1}"] = _apply_double_conv(params[f"up{i+1}"], state[f"up{i+1}"], x, train)
        x = conv2d(x, params["outc"]["w"], params["outc"]["b"], stride=1, padding=0)
        return jax.nn.sigmoid(x), ns


@ENCODER_REGISTRY.register()
def UNet(cfg, **kwargs) -> UNetNet:
    return UNetNet(cfg, **kwargs)
