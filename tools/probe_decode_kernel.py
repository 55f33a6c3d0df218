"""Prototype: Pallas decode-attention kernel over int8 K/V caches.

The sampler's cache dots run at ~116 GB/s logical through XLA's batched-
matvec emission (tools/probe_layout3.py) — 14% of the v5e HBM roofline —
and layout changes alone don't move it. This prototypes a Pallas kernel
with the fused-lane cache layout (b, cl, na*da=128):

  logits (na, cl) = Qbd (na, 128) @ K4[b] (cl, 128)^T   # block-diag Q:
                                                        # full 128-lane MXU
  w = softmax(logits * ks + extra) * vs
  out_full (na, 128) = w @ V4[b]                        # full-lane dot
  out (1, 128) = sublane-sum(out_full * blockdiag mask) # head a keeps its
                                                        # own 16 lanes

Correctness vs the XLA formulation (CPU interpret mode):
  python tools/probe_decode_kernel.py --check
TPU timing (chained 50-step scan, host-fenced):
  python tools/probe_decode_kernel.py
"""
import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

L, B, NA, CL, DA = 8, 256, 8, 256, 16
D = NA * DA  # 128


def decode_attn_xla(qbd, k4, ks, v4, vs, extra, scale):
    """Reference math on the fused layout (qbd already block-diagonal)."""
    logits = jnp.einsum("bae,bje->baj", qbd.astype(jnp.float32),
                        k4.astype(jnp.float32)) * scale
    logits = logits * ks + extra[None]
    w = jax.nn.softmax(logits, axis=-1) * vs
    outf = jnp.einsum("baj,bje->bae", w.astype(jnp.float32),
                      v4.astype(jnp.float32))  # (b, na, 128)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (NA, D), 1) // DA ==
            jax.lax.broadcasted_iota(jnp.int32, (NA, D), 0))
    return (outf * mask[None]).sum(1).astype(qbd.dtype)  # (b, 128)


def decode_attn_pallas(qbd, k4, ks, v4, vs, extra, scale, *, btile=8,
                       interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, na, d = qbd.shape
    cl = k4.shape[1]
    io = qbd.dtype

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, e_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (na, d), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (na, d), 0)
        mask = (lane // DA == row).astype(jnp.float32)
        for i in range(btile):
            kk = k_ref[i].astype(io)  # (cl, 128) int8 -> io
            logits = jax.lax.dot_general(
                q_ref[i], kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (na, cl)
            logits = logits * ks_ref[i] + e_ref[0]
            m = jnp.max(logits, axis=1, keepdims=True)
            w = jnp.exp(logits - m)
            w = w / jnp.sum(w, axis=1, keepdims=True)
            w = (w * vs_ref[i]).astype(io)  # fold V scales
            vv = v_ref[i].astype(io)  # (cl, 128)
            outf = jax.lax.dot_general(
                w, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (na, 128)
            o_ref[i] = jnp.sum(outf * mask, axis=0,
                               keepdims=True).astype(io)

    grid = (b // btile,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((btile, na, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, cl, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, na, cl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, cl, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btile, na, cl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, cl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((btile, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), io),
        interpret=interpret,
    )(qbd, k4, ks, v4, vs, extra).reshape(b, d)


def quantize_q(qbd):
    """(b, na, 128) block-diag q -> int8 + (b, na, 1) f32 scales."""
    q32 = qbd.astype(jnp.float32)
    sq = jnp.max(jnp.abs(q32), axis=-1, keepdims=True) / 127.0
    qi = jnp.clip(jnp.round(q32 / (sq + 1e-8)), -127.0, 127.0
                  ).astype(jnp.int8)
    return qi, sq


def make_inputs(key, b=B, cl=CL):
    ks_ = jax.random.split(key, 6)
    q = jax.random.normal(ks_[0], (b, NA, DA), jnp.float32)
    # block-diagonal expansion
    eye = jnp.eye(NA, dtype=jnp.float32)
    qbd = (q[:, :, None, :] * eye[None, :, :, None]).reshape(b, NA, D)
    k4 = jax.random.randint(ks_[1], (b, cl, D), -127, 128, jnp.int32).astype(jnp.int8)
    v4 = jax.random.randint(ks_[2], (b, cl, D), -127, 128, jnp.int32).astype(jnp.int8)
    ks = jax.random.uniform(ks_[3], (b, NA, cl), jnp.float32, 0.01, 0.02)
    vs = jax.random.uniform(ks_[4], (b, NA, cl), jnp.float32, 0.01, 0.02)
    # bias + causal mask row (shared across b)
    extra = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, NA, cl), 2) > cl // 2,
        -1e9, jax.random.normal(ks_[5], (1, NA, cl), jnp.float32) * 0.1)
    return qbd.astype(jnp.bfloat16), k4, ks, v4, vs, extra


def check():
    jax.config.update("jax_platforms", "cpu")
    qbd, k4, ks, v4, vs, extra = make_inputs(jax.random.key(0), b=16, cl=128)
    scale = 1.0 / np.sqrt(DA)
    ref = decode_attn_xla(qbd, k4, ks, v4, vs, extra[0], scale)
    got = decode_attn_pallas(qbd, k4, ks, v4, vs, extra, scale, btile=4,
                             interpret=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    print("max abs err pallas vs xla:", err)
    assert err < 0.05, err
    from lvt_tpu.ops.cache_attention import decode_attention_i8_pallas

    qi, sq = quantize_q(qbd)
    got8 = decode_attention_i8_pallas(qi, sq, k4, ks, v4, vs, extra, scale,
                                      out_dtype=jnp.bfloat16,
                                      btile=4, interpret=True)
    err8 = float(jnp.max(jnp.abs(got8.astype(jnp.float32) -
                                 ref.astype(jnp.float32))))
    print("max abs err pallas-i8 vs xla:", err8)
    assert err8 < 0.1, err8  # extra q/w int8 rounding
    print("OK")


def bench(btile=8, cl=CL):
    qbd, k4, ks, v4, vs, extra = make_inputs(jax.random.key(0), cl=cl)
    scale = 1.0 / np.sqrt(DA)
    # one layer's caches; chain 50 steps x 8 layers via scan over q
    LOGICAL = 2 * B * cl * D  # int8 K+V bytes per layer-call

    def run(fn, name):
        @jax.jit
        def f(qbd, k4, ks, v4, vs, extra):
            def body(x, _):
                for _l in range(L):
                    o = fn(x, k4, ks, v4, vs, extra)
                    # feed back to keep steps dependent
                    eye = jnp.eye(NA, dtype=jnp.float32)
                    x = (o.reshape(B, NA, DA)[:, :, None, :] *
                         eye[None, :, :, None]).reshape(B, NA, D).astype(x.dtype)
                return x, ()
            x, _ = jax.lax.scan(body, qbd, None, length=50)
            return x
        jax.block_until_ready(f(qbd, k4, ks, v4, vs, extra))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(qbd, k4, ks, v4, vs, extra)
            _ = float(r.reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) / 50 / L  # per layer-call
        print(f"{name}: {t*1e6:7.1f} us/layer-call, "
              f"{LOGICAL/t/1e9:7.1f} GB/s logical (cache bytes only)")

    # measure the SHIPPED kernel (ops/cache_attention.py), not a probe copy
    from lvt_tpu.ops.cache_attention import decode_attention_i8_pallas

    def i8_call(x, k4_, ks_, v4_, vs_, e_):
        qi, sq = quantize_q(x)
        return decode_attention_i8_pallas(qi, sq, k4_, ks_, v4_, vs_, e_,
                                          scale, btile=btile,
                                          interpret=False)

    run(i8_call, f"pallas int8-MXU-dot kernel (btile={btile}, cl={cl})")
    # Measured earlier same harness (git history): convert-then-bf16-dot
    # pallas kernel 192.5 us / 87 GB/s; xla fused-layout 138.4 us / 121 GB/s;
    # xla natural layout 145 us / 116 GB/s.


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--btile", type=int, default=8)
    ap.add_argument("--cl", type=int, default=CL)
    args = ap.parse_args()
    if args.check:
        check()
    else:
        bench(btile=args.btile, cl=args.cl)
