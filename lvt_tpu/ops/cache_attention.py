"""Pallas kernel: one-pixel attention over an int8-quantized KV cache.

Motivation (NOTES_r1.md): storing K/V caches in int8 should halve the
dominant HBM traffic of AR sampling, but XLA materializes the int8->bf16
convert of the whole cache before the dot, negating the win. This kernel
loads the int8 cache rows into VMEM, converts in-register, and applies the
per-row scales inside — HBM sees only int8.

Shapes (per call = one pixel, one decoder layer):
  q     (b, na, da)      bf16/f32 — query at the current pixel
  k8/v8 (b, na, CL, da)  int8     — quantized cache
  ks/vs (b, na, CL)      f32      — per-row absmax scales
  extra (b_or_1, na, CL) f32      — bias row + causal/-inf mask, precombined
returns (b, na, da) in q.dtype.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def cache_attention_xla(q, k8, ks, v8, vs, extra, scale):
    """Reference formulation (what XLA makes of it)."""
    logits = jnp.einsum("bad,bajd->baj", q.astype(jnp.float32),
                        k8.astype(jnp.float32)) * scale
    logits = logits * ks + extra
    w = jax.nn.softmax(logits, axis=-1) * vs
    out = jnp.einsum("baj,bajd->bad", w.astype(jnp.float32),
                     v8.astype(jnp.float32))
    return out.astype(q.dtype)


def cache_attention_pallas(q, k8, ks, v8, vs, extra, scale, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, na, da = q.shape
    CL = k8.shape[2]

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, e_ref, o_ref):
        for a in range(na):  # static unroll over heads
            qa = q_ref[0, a].astype(jnp.float32).reshape(1, da)
            kk = k_ref[0, a].astype(jnp.float32)  # (CL, da) from int8
            logits = jax.lax.dot_general(
                qa, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (1, CL)
            logits = logits * ks_ref[0, a].reshape(1, CL) + e_ref[0, a].reshape(1, CL)
            m = jnp.max(logits, axis=1, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            w = w * vs_ref[0, a].reshape(1, CL)
            vv = v_ref[0, a].astype(jnp.float32)  # (CL, da)
            out = jnp.dot(w, vv, preferred_element_type=jnp.float32)  # (1, da)
            o_ref[0, a] = out.reshape(da).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, na, da), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL, da), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, CL), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, na, da), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, na, da), q.dtype),
        interpret=interpret,
    )(q, k8, ks, v8, vs, extra)


# Measured on v5e (b=64, na=8, CL=256, da=128, 256-iteration scan):
#   pallas int8: 256 us/call | xla int8: 123 us/call | xla bf16: 107 us/call
# Verdict: XLA does NOT materialize a converted cache (int8 ~ bf16 there),
# and this grid-(b,) kernel loses 2x to XLA's pipelining — the per-pixel
# attention is latency-limited, not HBM-limited, at these shapes. Kept as a
# documented experiment; the sampler stays on the XLA formulation.
