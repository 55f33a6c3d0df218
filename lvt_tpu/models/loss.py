"""Loss modules (reference: vidgen/modeling/loss/loss.py + the GAN loss knobs
at config/defaults.py:139-145).

PixelLoss is folded into the VQ-VAE meta-arch (vqvae.py). GANLoss implements
the configured modes for completeness — the reference carries the config and
an alternating-update trainer path but ships NO discriminator module
(SURVEY.md §2.5), so nothing in the shipped configs reaches this.
"""

import jax.numpy as jnp


def pixel_loss_core(mode: str, lam: float, x_tilde, x):
    """lambda * (l1|l2) — the single implementation behind both the
    cfg-keyed wrapper below and VQVAE._pixel_loss."""
    diff = x_tilde.astype(jnp.float32) - x.astype(jnp.float32)
    if mode == "l2":
        l = jnp.mean(diff ** 2)
    elif mode == "l1":
        l = jnp.mean(jnp.abs(diff))
    else:
        raise NotImplementedError(mode)
    return lam * l


def pixel_loss(cfg, x_tilde, x):
    """lambda * (l1|l2) (reference loss.py:5-20)."""
    return pixel_loss_core(cfg.LOSS.PIXEL.MODE, cfg.LOSS.PIXEL.LAMBDA,
                           x_tilde, x)


def gan_loss(cfg, logits, target_is_real: bool):
    """wgan / lsgan / vanilla GAN criteria on discriminator logits."""
    mode = cfg.LOSS.GAN.MODE
    logits = logits.astype(jnp.float32)
    real_label = cfg.LOSS.GAN.REAL_LABEL
    fake_label = cfg.LOSS.GAN.FAKE_LABEL
    if mode == "wgan":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    target = jnp.full_like(logits, real_label if target_is_real else fake_label)
    if mode == "lsgan":
        return jnp.mean((logits - target) ** 2)
    if mode == "vanilla":
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    raise NotImplementedError(mode)
