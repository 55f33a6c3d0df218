"""Every shipped config must load, build its meta-arch, and initialize
parameters — the full registry path at real sizes."""

import os

import jax
import pytest

from lvt_tpu.config import get_cfg
from lvt_tpu.models import build_model, param_count

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

ALL_CONFIGS = [
    "vqvae/Base-VQVAE.yaml",
    "vqvae/PR-DVQVAE2.yaml",
    "vqvae/K-DVQVAE.yaml",
    "vt/DSFVT.yaml",
    "vt/DSSVT.yaml",
    "vt/DSTSVT.yaml",
    "vt/KDSFVT.yaml",
]


@pytest.mark.parametrize("rel", ALL_CONFIGS)
def test_config_builds_and_inits(rel):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, rel))
    if rel == "vqvae/Base-VQVAE.yaml":
        # base config has no dataset-specific channel counts; it is a _BASE_
        cfg.MODEL.ENCODER.IN_CHANNELS = 3
        cfg.MODEL.GENERATOR.OUT_CHANNELS = 3
    model = build_model(cfg)
    out = model.init(jax.random.key(0))
    params = out[0] if isinstance(out, tuple) else out
    n = param_count(params)
    assert n > 1e5, f"{rel}: suspiciously few params ({n})"


def test_vt_configs_subscale_geometry():
    """Stride/kernel geometry of each VT config yields the expected slice
    and context shapes at the 16x16x16 latent video."""
    from lvt_tpu.models.vt import VideoTransformer

    expect = {
        "vt/DSFVT.yaml": ((1, 16, 16), (7, 16, 16), 16),
        "vt/DSSVT.yaml": ((16, 8, 8), (16, 17, 17), 4),
        "vt/DSTSVT.yaml": ((4, 8, 8), (17, 17, 17), 16),
    }
    for rel, (slice_shape, ctx_shape, S) in expect.items():
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(CONFIG_DIR, rel))
        m = VideoTransformer(cfg, T=16, H=16, W=16)
        assert m.plan.slice_shape == slice_shape, rel
        assert m.plan.ctx_shape == ctx_shape, rel
        assert m.plan.num_slices == S, rel
