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
    # torch Conv2d default init
    fan_in = cin * k * k
    bound = float(np.sqrt(1.0 / fan_in))
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (k, k, cin, cout), jnp.float32,
                           -float(np.sqrt(6.0 / fan_in)), float(np.sqrt(6.0 / fan_in)))
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


def _bilinear_up2(x):
    """scale_factor=2 bilinear with align_corners=True (torch semantics)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


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
        # up blocks (bilinear): DoubleConv(in_ch, out_ch, mid=in_ch//2)
        ups = [(1024 // 2 + 512, 512, 256), (512 // 2 + 256 + 0, 256, 128),
               (256 // 2 + 0 + 128, 128, 64), (128, 64, 64)]
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
