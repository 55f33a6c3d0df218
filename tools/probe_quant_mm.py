"""Probe: the sampler's per-pixel weight GEMMs — bf16 XLA vs int8 XLA
(materialized dequant, the measured 1.8x LOSS) vs the native int8-MXU
Pallas kernel (ops/quant_matmul.py).

Shapes are DSFVT's per-layer decode GEMMs at the bench batch: for each of
L=8 layers, y(b,512) @ wqkv(512,3072), out(b,1024) @ proj(1024,512),
h(b,512) @ ffn1(512,512), h(b,512) @ ffn2(512,512). Per-layer weight bytes:
5.24 MB bf16 / 2.62 MB int8 — the weight stream is the batch-independent
part of the per-pixel HBM floor.

Correctness (CPU interpret): python tools/probe_quant_mm.py --check
TPU timing (chained scan, host-fenced): python tools/probe_quant_mm.py
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lvt_tpu.ops.quant_matmul import matmul_i8w_pallas, matmul_i8w_xla

L = 8
SHAPES = [(512, 3072), (1024, 512), (512, 512), (512, 512)]  # DSFVT layer


def quant_cols(key, d, n):
    w = jax.random.normal(key, (d, n), jnp.float32) * 0.02
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    wi = jnp.clip(jnp.round(w / (s[None] + 1e-8)), -127, 127).astype(jnp.int8)
    return w.astype(jnp.bfloat16), wi, s.astype(jnp.float32)


def make_weights(key):
    keys = jax.random.split(key, L * len(SHAPES))
    return [[quant_cols(k, d, n) for k, (d, n) in
             zip(keys[i * len(SHAPES):(i + 1) * len(SHAPES)], SHAPES)]
            for i in range(L)]


def chain(mm, weights, b, steps=50):
    """Dependent scan: each layer's GEMM chain feeds the next (projections
    between mismatched widths keep the dependency without extra weights)."""

    def body(x, _):
        for lw in weights:
            y = mm(x, lw[0])  # (b, 3072)
            y = y[:, :1024]
            y = mm(y, lw[1])  # (b, 512)
            y = mm(y, lw[2])
            x = mm(y, lw[3]).astype(x.dtype)
        return x, ()

    @jax.jit
    def f(x):
        return jax.lax.scan(body, x, None, length=steps)[0]

    return f


def run(name, f, x, steps, wbytes):
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(x)
        _ = float(r[0, 0])  # host-read fence
        ts.append(time.perf_counter() - t0)
    per_layer = float(np.median(ts)) / steps / L
    print(f"{name}: {per_layer * 1e6:7.1f} us/layer, "
          f"{wbytes / per_layer / 1e9:7.1f} GB/s weight stream "
          f"(min {min(ts):.4f}s median {np.median(ts):.4f}s of {steps}x{L})")


def bench(b, steps=50):
    weights = make_weights(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (b, 512), jnp.bfloat16)
    pbytes = sum(d * n for d, n in SHAPES)

    run("xla bf16 ", chain(lambda y, w: y @ w[0], weights, b, steps), x,
        steps, pbytes * 2)
    run("xla int8 ", chain(
        lambda y, w: (y @ w[1].astype(jnp.bfloat16)) * w[2].astype(jnp.bfloat16),
        weights, b, steps), x, steps, pbytes)
    run("pallas i8", chain(
        lambda y, w: matmul_i8w_pallas(y, w[1], w[2], out_dtype=jnp.bfloat16),
        weights, b, steps), x, steps, pbytes)


def check():
    jax.config.update("jax_platforms", "cpu")
    w, wi, s = quant_cols(jax.random.key(0), 128, 256)
    y = jax.random.normal(jax.random.key(1), (8, 128), jnp.float32)
    ref = matmul_i8w_xla(y, wi, s)
    got = matmul_i8w_pallas(y, wi, s, interpret=True)
    err = float(jnp.max(jnp.abs(got - ref)))
    print("max abs err pallas vs xla-ref:", err)
    assert err < 1e-5, err
    exact = y @ w.astype(jnp.float32)
    rel = float(jnp.median(jnp.abs(got - exact) / (jnp.abs(exact) + 1e-4)))
    print("median rel err vs unquantized:", rel)
    assert rel < 0.02, rel
    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    if args.check:
        check()
    else:
        bench(args.batch, args.steps)
