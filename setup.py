#!/usr/bin/env python
from setuptools import find_packages, setup

setup(
    name="lvt_tpu",
    version="0.1.0",
    description="TPU-native Latent Video Transformer framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pyyaml",
        "Pillow",
    ],
    extras_require={
        "convert": ["torch"],  # .pth checkpoint conversion
        "tb": ["tensorboard"],
    },
)
