"""lvt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the Latent Video
Transformer framework (reference: rakhimovv/lvt, arXiv:2006.10704).

Two-stage video generation: a per-frame VQ-VAE compressing 64x64 frames into
decomposed discrete codes, and a subscale-ordered autoregressive Video
Transformer over the latent code video, with a fully jitted lax.scan sampling
path and Pallas kernels for the quantizer and block-local attention.
"""

from .utils.env import setup_environment

setup_environment()

__version__ = "0.1.0"
