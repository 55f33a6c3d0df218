"""On-device video-frame preprocessing: center-crop square + Lanczos resize.

The reference preprocesses Kinetics frames on the host, one PIL call per
frame (reference scripts/convert_kinetics.py:41-47: crop the centered
min(H, W) square, ``Image.LANCZOS``-resize to ``img_size``). Rebuilt here as
a batched, jit-compilable op so the crop/resize rides the accelerator and
can fuse into the same program as the VQ-VAE encode (north-star requirement:
preprocessing feeds a single jit-compiled generate path).

Numerics: ``jax.image.resize(method="lanczos3", antialias=True)`` is the
same separable a=3 Lanczos filter with downscale-adjusted support that PIL's
``Image.LANCZOS`` applies. Measured agreement with PIL on uint8 frames: max
1/255 at the Kinetics geometry (>=240 px min-dim -> 64, scale >= 3.75); at
small scale factors (<~2x) rare pixels differ by up to ~10/255 because PIL
resamples in fixed point with a rounded uint8 intermediate between its
horizontal and vertical passes — the float32 path here is the *more*
accurate of the two (a smooth-gradient probe matches PIL exactly, ruling
out any sample-position convention mismatch). The centered crop start is
``(W - dim) // 2`` — identical to PIL's rounding of the reference's
fractional box for both even and odd remainders.
"""

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["center_crop_square", "center_crop_resize"]


def center_crop_square(frames: jnp.ndarray) -> jnp.ndarray:
    """Crop the centered min(H, W) square from (..., H, W, C) frames.

    Static-shape slice (H, W are trace-time constants), so it folds into
    whatever program it is traced under.
    """
    h, w = frames.shape[-3], frames.shape[-2]
    dim = min(h, w)
    top = (h - dim) // 2
    left = (w - dim) // 2
    return frames[..., top:top + dim, left:left + dim, :]


def center_crop_resize(
    frames: jnp.ndarray,
    img_size: int,
    method: str = "lanczos3",
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Center-crop square then resize to (img_size, img_size), on device.

    frames: (..., H, W, C), any integer or float dtype. Arbitrary leading
    batch dims (the resize touches only the two spatial axes). Integer
    inputs are filtered in float32 and rounded/clipped back to the input
    range on store; float inputs stay float.

    ``out_dtype`` overrides the output dtype (default: the input dtype).

    Equivalent of the reference's per-frame PIL crop+LANCZOS
    (scripts/convert_kinetics.py:41-47), batched and jit-compilable.
    """
    x = center_crop_square(frames)
    in_dtype = frames.dtype
    integer_in = jnp.issubdtype(in_dtype, jnp.integer)
    xf = x.astype(jnp.float32)
    out_shape = x.shape[:-3] + (img_size, img_size, x.shape[-1])
    y = jax.image.resize(xf, out_shape, method=method, antialias=True)
    if integer_in:
        info = jnp.iinfo(in_dtype)
        y = jnp.clip(jnp.round(y), info.min, info.max)
    return y.astype(out_dtype if out_dtype is not None else in_dtype)
