"""Probe: does the KV-cache layout waste HBM via lane padding?

DSFVT's incremental sampler stores K/V caches as (L, b, na, cl, da) with
da=16 minormost. TPU tiles arrays over the last two dims — (32, 128) for
int8 — so a 16-wide minor dim may be padded to 128 lanes (8x bytes).
This probe measures:
  1. real device memory footprints of candidate layouts (memory_stats)
  2. per-pixel-step runtime of the attention cache read/write chain for
     each layout, under a lax.scan like the real sampler

Run on the TPU (no args): python tools/probe_layout.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

L, B, NA, CL, DA = 8, 256, 8, 256, 16
D = NA * DA


def footprint(shape, dtype):
    dev = jax.devices()[0]
    stats = dev.memory_stats()
    if stats is None or "bytes_in_use" not in stats:
        return None
    before = dev.memory_stats()["bytes_in_use"]
    x = jnp.zeros(shape, dtype)
    x.block_until_ready()
    after = dev.memory_stats()["bytes_in_use"]
    del x
    return after - before


def bench(fn, carry, steps, n=3):
    out = jax.block_until_ready(fn(carry, steps))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(carry, steps)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])  # host fence
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print("devices:", jax.devices())
    logical = L * B * NA * CL * DA
    for name, shape in [
        ("(L,b,na,cl,da) current", (L, B, NA, CL, DA)),
        ("(L,b,na,da,cl)", (L, B, NA, DA, CL)),
        ("(L,b,cl,na*da)", (L, B, CL, NA * DA)),
        ("(L,b,na*da,cl)", (L, B, NA * DA, CL)),
    ]:
        fp = footprint(shape, jnp.int8)
        if fp is None:
            print("memory_stats unavailable")
            break
        print(f"int8 {name}: {fp/1e6:8.1f} MB  (logical {logical/1e6:.1f} MB, "
              f"pad x{fp/logical:.2f})")

    # --- runtime probes: N pixel steps of [DUS write row p] + [QK^T] + [PV]
    N = 64
    steps = jnp.arange(CL - N, CL, dtype=jnp.int32)
    q = jnp.zeros((B, NA, DA), jnp.bfloat16)
    newrow = jnp.zeros((B, NA, DA), jnp.int8)

    # A: current layout (L,b,na,cl,da)
    def step_a(c, p):
        kc, acc = c
        kc = kc.at[:, :, :, p].set(jnp.broadcast_to(newrow, (L, B, NA, DA)))
        o = 0.0
        for l in range(L):
            logits = jnp.einsum("bak,bajk->baj", q, kc[l].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
            o = o + jnp.einsum("baj,bajk->bak", w, kc[l].astype(jnp.bfloat16))
        return (kc, acc + o.astype(jnp.float32)), None

    # B: (L,b,cl,na*da): row write is one sublane row; contractions via
    # free reshape (split) of the minor dim
    def step_b(c, p):
        kc, acc = c
        kc = kc.at[:, :, p].set(
            jnp.broadcast_to(newrow.reshape(B, D), (L, B, D)))
        o = 0.0
        for l in range(L):
            k4 = kc[l].reshape(B, CL, NA, DA).astype(jnp.bfloat16)
            logits = jnp.einsum("bak,bjak->baj", q, k4,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
            o = o + jnp.einsum("baj,bjak->bak", w, k4)
        return (kc, acc + o.astype(jnp.float32)), None

    # C: (L,b,na*da,cl): column write along lanes; contraction over cl
    def step_c(c, p):
        kc, acc = c
        kc = kc.at[:, :, :, p].set(
            jnp.broadcast_to(newrow.reshape(B, D), (L, B, D)))
        o = 0.0
        for l in range(L):
            k4 = kc[l].reshape(B, NA, DA, CL).astype(jnp.bfloat16)
            logits = jnp.einsum("bak,bakj->baj", q, k4,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
            o = o + jnp.einsum("baj,bakj->bak", w, k4)
        return (kc, acc + o.astype(jnp.float32)), None

    for name, step, shape in [
        ("A current (..,cl,da)", step_a, (L, B, NA, CL, DA)),
        ("B (..,cl,na*da)", step_b, (L, B, CL, D)),
        ("C (..,na*da,cl)", step_c, (L, B, D, CL)),
    ]:
        kc0 = jnp.zeros(shape, jnp.int8)
        acc0 = jnp.zeros((B, NA, DA), jnp.float32)

        @jax.jit
        def run(carry, ps, step=step):
            (kc, acc), _ = jax.lax.scan(step, carry, ps)
            return acc

        t = bench(run, (kc0, acc0), steps)
        per_px = t / N * 1e6
        # bytes: K read per step per layer at full length
        rd = B * CL * D  # int8 bytes logical
        print(f"{name}: {t*1e3:7.2f} ms / {N} steps = {per_px:7.1f} us/px  "
              f"(logical K+V reads {2*L*rd*N/1e9:.2f} GB)")


if __name__ == "__main__":
    main()
