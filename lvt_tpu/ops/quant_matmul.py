"""Pallas kernel: per-pixel GEMM over int8 weights with native MXU dots.

Motivation (BASELINE.md / NOTES_r3.md): streaming the sampler's per-pixel
layer weights as int8 through XLA loses 1.8x — XLA materializes the
int8->bf16 dequant of the whole (d, N) weight before the (b, d) x (d, N)
dot, so HBM traffic goes UP, not down. The measured rule on v5e is that any
path converting int8 ELEMENTWISE runs at the VPU's ~120 GB/s; only the MXU
ingests int8 natively (2 elements/lane/cycle). This kernel is the weight-
side twin of ops/cache_attention.decode_attention_i8_pallas: the int8
weight bytes reach the MXU unconverted, the activation rows are absmax-
quantized per row in-register (small: (b, d)), and the dequant happens on
the (b, N) output via the exact scale fold

    (quant_row(y) @ W_int) * (s_y[:, None] * s_w[None, :])  ~=  y @ W

s_w is the per-output-column absmax scale baked at cache-build time
(vt_incremental._quantize_cols); s_y adds the only new rounding (int8 on
the activations, ~0.4% rel — same order as mm_dtype='int8' on q).

Reference anchor: the reference has no quantized serving path at all
(vidgen/modeling/autoregressive/videotransformer.py:240-246 samples in
fp32); this is a TPU-native capability addition.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_rows_i8(y):
    """(b, d) float -> ((b, d) int8, (b, 1) f32 scales). absmax/127 rows."""
    sy = jnp.max(jnp.abs(y), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    yi = jnp.clip(jnp.round(y.astype(jnp.float32) / (sy + 1e-8)),
                  -127.0, 127.0).astype(jnp.int8)
    return yi, sy


def matmul_i8w_xla(y, wi, sw):
    """XLA reference of the kernel's exact math (CPU tests): quantize the
    activation rows, int32 dot, dequant on the output."""
    yi, sy = quantize_rows_i8(y)
    acc = jax.lax.dot_general(
        yi.astype(jnp.int32), wi.astype(jnp.int32),
        dimension_numbers=(((1,), (0,)), ((), ())))  # (b, N) int32
    return (acc.astype(jnp.float32) * sy *
            sw.reshape(1, -1).astype(jnp.float32)).astype(y.dtype)


def _pick_btile(b: int) -> int:
    # GEMM rows: bigger tiles keep the MXU busy; int8 sublane tile is 32
    for t in (256, 128, 64, 32, 16, 8, 4, 2):
        if b % t == 0:
            return t
    return 1


def matmul_i8w_pallas(y, wi, sw, *,
                      out_dtype=None,
                      btile: Optional[int] = None,
                      interpret: Optional[bool] = None):
    """y (b, d) float @ wi (d, N) int8, exact per-column scales sw (N,).

    Quantizes y per row to int8 in-register, runs ONE int8 x int8 MXU dot
    (int32 accumulate), and scales the (b, N) output by s_y * s_w. The
    (d, N) weight bytes cross HBM as int8 — half the bf16 traffic, no
    VPU-rate dequant pass. Returns (b, N) in out_dtype (default y.dtype).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if out_dtype is None:
        out_dtype = y.dtype
    b, d = y.shape
    n = wi.shape[1]
    sw2 = sw.reshape(1, n).astype(jnp.float32)
    if btile is None:
        btile = _pick_btile(b)
    assert b % btile == 0, \
        f"btile={btile} must divide the batch ({b}): the grid would " \
        f"silently skip the trailing {b % btile} rows"

    def kernel(y_ref, w_ref, s_ref, o_ref):
        yf = y_ref[...].astype(jnp.float32)  # (btile, d)
        sy = jnp.max(jnp.abs(yf), axis=1, keepdims=True) / 127.0
        yi = jnp.clip(jnp.round(yf / (sy + 1e-8)),
                      -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            yi, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (btile, n) int32
        o_ref[...] = (acc.astype(jnp.float32) * sy * s_ref[...]
                      ).astype(o_ref.dtype)

    from .cache_attention import _parallel_compiler_params

    compiler_params = _parallel_compiler_params(pltpu)
    return pl.pallas_call(
        kernel,
        grid=(b // btile,),
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((btile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        interpret=interpret,
    )(y, wi, sw2)
