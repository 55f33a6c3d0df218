"""Meta-architecture registry and builder (reference:
vidgen/modeling/meta_arch/build.py:3-22)."""

import logging

import jax

from ..utils.registry import Registry
from .decoders import GENERATOR_REGISTRY, build_generator
from .encoders import ENCODER_REGISTRY, build_encoder
from .vqvae import VQVAE, AutoEncoder
from .vt import AUTOREGRESSIVE_REGISTRY, VideoTransformer, build_autoregressive

META_ARCH_REGISTRY = Registry("META_ARCH")
META_ARCH_REGISTRY._do_register("VQVAEModel", VQVAE)
META_ARCH_REGISTRY._do_register("AutoEncoderModel", AutoEncoder)
META_ARCH_REGISTRY._do_register("VideoTransformerModel", VideoTransformer)


def build_model(cfg, **kwargs):
    name = cfg.MODEL.META_ARCHITECTURE
    model = META_ARCH_REGISTRY.get(name)(cfg, **kwargs)
    logger = logging.getLogger(__name__)
    logger.info(f"Built meta-architecture {name}")
    return model


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_floats(tree, dtype):
    """Cast floating leaves (bf16 inference weights); ints/bools untouched."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


__all__ = [
    "AUTOREGRESSIVE_REGISTRY",
    "ENCODER_REGISTRY",
    "GENERATOR_REGISTRY",
    "META_ARCH_REGISTRY",
    "AutoEncoder",
    "VQVAE",
    "VideoTransformer",
    "build_autoregressive",
    "build_encoder",
    "build_generator",
    "build_model",
    "param_count",
]
