"""VQ-VAE model tests: shapes on the real PR-DVQVAE2 config, loss
differentiability, EMA state flow, encode/decode roundtrip consistency."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lvt_tpu.config import get_cfg
from lvt_tpu.models.vqvae import VQVAE, AutoEncoder

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _small_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    # shrink for test speed
    cfg.MODEL.ENCODER.NF = 32
    cfg.MODEL.ENCODER.RES_CHANNELS = 16
    cfg.MODEL.GENERATOR.NF = 32
    cfg.MODEL.GENERATOR.RES_CHANNELS = 16
    cfg.MODEL.GENERATOR.IN_CHANNELS = 32
    cfg.MODEL.CODEBOOK.DIM = 32
    cfg.MODEL.ENCODER.OUT_CHANNELS = 32
    return cfg


def test_vqvae_shapes_and_loss(rng):
    cfg = _small_cfg()
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    total, (loss_dict, new_state) = model.loss(params, state, x, use_pallas=False)
    assert np.isfinite(float(total))
    assert set(loss_dict) == {"loss_reconstruction", "loss_commitment"}  # EMA: no codebook loss
    # EMA buffers advanced
    assert not np.allclose(np.asarray(new_state["netC"].running_size),
                           np.asarray(state["netC"].running_size))

    recon, idx = model.reconstruct(params, state, x)
    assert recon.shape == x.shape
    assert idx.shape == (2, 8, 8, 4)
    assert idx.dtype == jnp.int32
    assert int(idx.max()) < 512 and int(idx.min()) >= 0


def test_vqvae_grads_flow_to_encoder_and_generator(rng):
    cfg = _small_cfg()
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    grads = jax.grad(lambda p: model.loss(p, state, x, use_pallas=False)[0])(params)
    ge = jax.tree_util.tree_reduce(lambda a, l: a + float(jnp.abs(l).sum()), grads["netE"], 0.0)
    gg = jax.tree_util.tree_reduce(lambda a, l: a + float(jnp.abs(l).sum()), grads["netG"], 0.0)
    assert ge > 0 and gg > 0


def test_vqvae_decode_of_encode_indices_consistent(rng):
    cfg = _small_cfg()
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    idx = model.encode(params, state, x)
    y1 = model.decode(params, state, idx)
    y2, idx2 = model.reconstruct(params, state, x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_non_ema_codebook_is_trainable(rng):
    cfg = _small_cfg()
    cfg.MODEL.CODEBOOK.EMA = False
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    assert "embedding" in params["netC"]
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    total, (loss_dict, _) = model.loss(params, state, x, use_pallas=False)
    assert "loss_dict" in loss_dict  # the codebook MSE term
    g = jax.grad(lambda p: model.loss(p, state, x, use_pallas=False)[0])(params)
    assert float(jnp.abs(g["netC"]["embedding"]).sum()) > 0


def test_autoencoder_meta_arch(rng):
    cfg = _small_cfg()
    cfg.MODEL.META_ARCHITECTURE = "AutoEncoderModel"
    model = AutoEncoder(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    loss, (ld, _) = model.loss(params, state, x)
    assert np.isfinite(float(loss))
    y = model.interpolate_first_last(params, state, x)
    assert y.shape[0] == 2


def test_vqvae_full_size_config_shapes(rng):
    """Full PR-DVQVAE2: 64x64x3 -> 16x16 grid of 4 codes (BASELINE.md
    latent compression row)."""
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    model = VQVAE(cfg)
    params, state = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    idx = model.encode(params, state, x)
    assert idx.shape == (1, 16, 16, 4)
    y = model.decode(params, state, idx)
    assert y.shape == (1, 64, 64, 3)
