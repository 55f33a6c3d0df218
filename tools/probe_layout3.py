"""Chained-read probe: achieved HBM rate of the sampler's cache dots on v5e
for candidate K/V cache layouts (no memory_stats through the tunnel).

Each variant runs 50 chained pixel-ish steps (8 unrolled layers, logits dot
+ out dot against int8 caches, softmax between) in ONE jit, host-fenced.
Reported GB/s counts LOGICAL cache bytes; padding shows up as a lower rate.
"""
import time
import jax, jax.numpy as jnp, numpy as np

L, B, NA, CL, DA = 8, 256, 8, 256, 16
LOGICAL = 2 * L * B * NA * CL * DA  # K+V bytes touched per step (int8)

def timeit(f, *args, n=3):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        _ = float(r.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

def report(name, t):
    per = t / 50
    print(f"{name}: {t*1e3:8.2f} ms/50 -> {per*1e6:7.1f} us/step, "
          f"{LOGICAL/per/1e9:7.1f} GB/s logical")

# A: current layout (L,B,NA,CL,DA), contract DA (einsum bak,bajk->baj)
kcA = jnp.zeros((L, B, NA, CL, DA), jnp.int8)
vcA = jnp.zeros((L, B, NA, CL, DA), jnp.int8)
@jax.jit
def fA(q0, kc, vc):
    def body(x, _):
        for l in range(L):
            logits = jnp.einsum("bak,bajk->baj", x, kc[l].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
            x = jnp.einsum("baj,bajk->bak", w, vc[l].astype(jnp.bfloat16))
        return x, ()
    x, _ = jax.lax.scan(body, q0, None, length=50)
    return x
q0 = jnp.ones((B, NA, DA), jnp.bfloat16)
report("A (L,B,NA,CL,16) da-contract", timeit(fA, q0, kcA, vcA))

# B: cl-minor layout (L,B,NA,DA,CL), contract DA on sublanes
kcB = jnp.zeros((L, B, NA, DA, CL), jnp.int8)
vcB = jnp.zeros((L, B, NA, DA, CL), jnp.int8)
@jax.jit
def fB(q0, kc, vc):
    def body(x, _):
        for l in range(L):
            logits = jnp.einsum("bak,bakj->baj", x, kc[l].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
            x = jnp.einsum("baj,bakj->bak", w, vc[l].astype(jnp.bfloat16))
        return x, ()
    x, _ = jax.lax.scan(body, q0, None, length=50)
    return x
report("B (L,B,NA,16,CL) cl-minor   ", timeit(fB, q0, kcB, vcB))

# C: fused-lane layout (L,B,CL,NA*DA=128), block-diagonal q trick
kcC = jnp.zeros((L, B, CL, NA * DA), jnp.int8)
vcC = jnp.zeros((L, B, CL, NA * DA), jnp.int8)
blockmask = jnp.kron(jnp.eye(NA, dtype=jnp.bfloat16),
                     jnp.ones((1, DA), jnp.bfloat16))  # (NA, 128)
@jax.jit
def fC(q0, kc, vc):
    def body(x, _):
        for l in range(L):
            # expand q (B,NA,DA) -> block-diagonal (B,NA,128)
            qb = jnp.einsum("bad,ae->bae", x,
                            jnp.ones((NA, 1), jnp.bfloat16))  # placeholder
            qb = (x[:, :, None, :] * jnp.eye(NA, dtype=jnp.bfloat16)[None, :, :, None]
                  ).reshape(B, NA, NA * DA)
            logits = jnp.einsum("bae,bje->baj", qb, kc[l].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits, -1).astype(jnp.bfloat16)
            outf = jnp.einsum("baj,bje->bae", w, vc[l].astype(jnp.bfloat16))
            x = (outf * blockmask[None]).sum(1).reshape(B, NA, DA)
        return x, ()
    x, _ = jax.lax.scan(body, q0, None, length=50)
    return x
report("C (L,B,CL,128) block-diag   ", timeit(fC, q0, kcC, vcC))
