"""Auto-encoder and VQ-VAE meta-architectures, functional form
(reference: vidgen/modeling/meta_arch/ae.py, vqvae.py).

Params/state are split into the reference's three checkpoint subtrees:
``netE`` (encoder), ``netG`` (generator/decoder), ``netC`` (codebook) —
matching the per-submodule Checkpointer layout (ae.py:231-238,
vqvae.py:118-122) so converted torch checkpoints drop in.

EMA codebooks are *state*, not params (requires_grad=False in the reference,
vqvae.py:32-33): the quantizer returns the updated EmaCodebookState from the
jitted step. Non-EMA codebooks put the embedding in params and train it with
the codebook MSE loss.

Layouts: frames NHWC on device; public ``encode``/``decode`` speak the
reference's (.., nc, h, w) latent layout for CodesExtractor .npy compat.
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import vq as vq_ops
from .decoders import build_generator
from .encoders import build_encoder


class VQVAE:
    """Two-stage-ready VQ-VAE (meta_arch VQVAEModel, vqvae.py:17-124)."""

    def __init__(self, cfg):
        self.cfg = cfg
        cb = cfg.MODEL.CODEBOOK
        self.num = cb.NUM
        self.K = cb.SIZE
        self.D = cb.DIM
        self.ema = cb.EMA
        self.beta = cb.BETA
        self.encoder = build_encoder(cfg)
        self.generator = build_generator(cfg)
        self.pixel_mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
        self.pixel_std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)
        loss_mode = cfg.LOSS.PIXEL.MODE
        assert loss_mode in ("l1", "l2")
        self.pixel_loss_mode = loss_mode
        self.pixel_loss_lambda = cfg.LOSS.PIXEL.LAMBDA

    # -- init ---------------------------------------------------------------
    def init(self, key) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        ke, kg, kc = jax.random.split(key, 3)
        pe, se = self.encoder.init(ke)
        pg, sg = self.generator.init(kg)
        cb = vq_ops.init_codebook(kc, self.num, self.K, self.D)
        if self.ema:
            params = {"netE": pe, "netG": pg, "netC": {}}
            state = {"netE": se, "netG": sg, "netC": cb}
        else:
            params = {"netE": pe, "netG": pg, "netC": {"embedding": cb.embedding}}
            state = {"netE": se, "netG": sg,
                     "netC": cb._replace(embedding=jnp.zeros((0,)))}
        return params, state

    def _codebook_state(self, params, state) -> vq_ops.EmaCodebookState:
        if self.ema:
            return state["netC"]
        return state["netC"]._replace(embedding=params["netC"]["embedding"])

    # -- data plumbing -------------------------------------------------------
    def normalize(self, x):
        """(x - mean) / std on NHWC frames (reference ae.py:34-37)."""
        return (x - self.pixel_mean) / self.pixel_std

    def denormalize(self, y):
        return y * self.pixel_std + self.pixel_mean

    # -- core passes ---------------------------------------------------------
    def encode_features(self, params, state, x, *, train=False, axis_name=None):
        """NHWC frames -> (b, h, w, D) pre-quantization features."""
        return self.encoder.apply(params["netE"], state["netE"], x,
                                  train=train, axis_name=axis_name)

    def decode_features(self, params, state, z, *, train=False, axis_name=None):
        return self.generator.apply(params["netG"], state["netG"], z,
                                    train=train, axis_name=axis_name)

    def encode(self, params, state, x):
        """NHWC frames -> (b, h, w, num) int32 code indices
        (reference encode, vqvae.py:93-101; layout transposed from its
        (b, num, h, w) — converters at the IO boundary restore it)."""
        z_e, _ = self.encode_features(params, state, x)
        return vq_ops.encode_indices(z_e, self._codebook_state(params, state))

    def decode(self, params, state, indices):
        """(b, h, w, num) indices -> NHWC frames (reference decode,
        vqvae.py:103-106)."""
        cb = self._codebook_state(params, state)
        z_q = vq_ops.embed_indices(indices, cb)
        y, _ = self.decode_features(params, state, z_q)
        return y

    def reconstruct(self, params, state, x):
        """frames -> (reconstruction, indices): the eval/inference pass
        (reference encode_decode with return_latent, ae.py:193-205)."""
        z_e, _ = self.encode_features(params, state, x)
        cb = self._codebook_state(params, state)
        idx = vq_ops.encode_indices(z_e, cb)
        z_q = vq_ops.embed_indices(idx, cb)
        y, _ = self.decode_features(params, state, z_q)
        return y, idx

    def _pixel_loss(self, x_tilde, x):
        from .loss import pixel_loss_core

        return pixel_loss_core(self.pixel_loss_mode, self.pixel_loss_lambda,
                               x_tilde, x)

    def loss(self, params, state, x, *, train=True, axis_name=None,
             use_pallas=None):
        """Supervised VQ-VAE loss (reference compute_supervised_loss,
        vqvae.py:66-91). x: NHWC normalized frames.

        Returns (total_loss, (loss_dict, new_state)).
        """
        z_e, se = self.encode_features(params, state, x, train=train, axis_name=axis_name)
        cb = self._codebook_state(params, state)
        z_q_st, z_q, _, new_cb = vq_ops.quantize_st(
            z_e, cb, ema=self.ema, train=train, axis_name=axis_name,
            use_pallas=use_pallas)
        x_tilde, sg = self.decode_features(params, state, z_q_st, train=train, axis_name=axis_name)

        f32 = lambda a: a.astype(jnp.float32)
        loss_dict = {"loss_reconstruction": self._pixel_loss(x_tilde, x)}
        if not self.ema:
            loss_dict["loss_dict"] = jnp.mean(
                (f32(z_q) - jax.lax.stop_gradient(f32(z_e))) ** 2)
        loss_dict["loss_commitment"] = self.beta * jnp.mean(
            (f32(z_e) - jax.lax.stop_gradient(f32(z_q))) ** 2)

        new_state = {"netE": se, "netG": sg,
                     "netC": new_cb if self.ema else state["netC"]}
        total = sum(loss_dict.values())
        return total, (loss_dict, new_state)

    def visualize_training(self, params, state, batch):
        """Reconstruction grids for TensorBoard (reference
        visualize_training, ae.py:86-99): first 3 frames, tiled, CHW uint8."""
        from ..utils.image import array2im

        x = batch.get("image")
        if x is None:
            x = batch["image_sequence"][0]
        x = jnp.asarray(x[:3])
        recon, _ = self.reconstruct(params, state, self.normalize(x))
        img = array2im(
            jnp.transpose(recon, (0, 3, 1, 2)),
            normalize=self.cfg.MODEL.GENERATOR.OUT_ACTIVATION == "tanh",
            tile=True)
        if img.ndim == 2:
            img = img[:, :, None]
        return {"reconstruction": img.transpose(2, 0, 1)}

    def train_loss(self, params, model_state, batch, rng, *, axis_name=None):
        """Uniform trainer interface. batch: {"image": (b, H, W, C)} or
        {"image_sequence": (b, t, H, W, C)} raw frames (already /255 when
        INPUT.SCALE_TO_ZEROONE); normalization happens here on device
        (reference preprocess_data, ae.py:151-168)."""
        if "image_sequence" in batch:
            x = batch["image_sequence"]
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
        else:
            x = batch["image"]
        x = self.normalize(x)
        return self.loss(params, model_state, x, train=True, axis_name=axis_name)


class AutoEncoder:
    """Plain AE meta-arch (reference AutoEncoderModel, ae.py:21-244)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.encoder = build_encoder(cfg)
        self.generator = build_generator(cfg)
        self.pixel_mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
        self.pixel_std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)

    def init(self, key):
        ke, kg = jax.random.split(key)
        pe, se = self.encoder.init(ke)
        pg, sg = self.generator.init(kg)
        return {"netE": pe, "netG": pg}, {"netE": se, "netG": sg}

    def normalize(self, x):
        return (x - self.pixel_mean) / self.pixel_std

    def denormalize(self, y):
        return y * self.pixel_std + self.pixel_mean

    def encode(self, params, state, x, *, train=False, axis_name=None):
        return self.encoder.apply(params["netE"], state["netE"], x,
                                  train=train, axis_name=axis_name)

    def decode(self, params, state, z, *, train=False, axis_name=None):
        return self.generator.apply(params["netG"], state["netG"], z,
                                    train=train, axis_name=axis_name)

    def reconstruct(self, params, state, x):
        z, _ = self.encode(params, state, x)
        y, _ = self.decode(params, state, z)
        return y, z

    def interpolate_first_last(self, params, state, x):
        """Latent lerp between the first and last frame of a batch
        (reference ae.py:207-218)."""
        b = x.shape[0]
        start, _ = self.encode(params, state, x[:1])
        end, _ = self.encode(params, state, x[-1:])
        alphas = jnp.linspace(0.0, 1.0, b).reshape(b, 1, 1, 1)
        zmix = start + alphas * (end - start)
        y, _ = self.decode(params, state, zmix)
        return y

    def loss(self, params, state, x, *, train=True, axis_name=None, **_):
        """MSE autoencoding loss (reference compute_generator_loss,
        ae.py:170-181)."""
        z, se = self.encode(params, state, x, train=train, axis_name=axis_name)
        out, sg = self.decode(params, state, z, train=train, axis_name=axis_name)
        loss = jnp.mean((out - x) ** 2)
        return loss, ({"loss_ae_mse": loss}, {"netE": se, "netG": sg})

    def train_loss(self, params, model_state, batch, rng, *, axis_name=None):
        if "image_sequence" in batch:
            x = batch["image_sequence"]
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
        else:
            x = batch["image"]
        x = self.normalize(x)
        return self.loss(params, model_state, x, train=True, axis_name=axis_name)
