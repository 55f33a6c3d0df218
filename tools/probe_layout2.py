"""Ground-truth probe of TPU physical layouts for the KV-cache shapes.

1. Query jax's device layout (tiling) for candidate shapes.
2. Time a pure elementwise read (sum) of equal-logical-size arrays: if the
   (…, 16)-minor array reads ~8x slower, lane padding is physically real.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("jax", jax.__version__)

L, B, NA, CL, DA = 8, 256, 8, 256, 16


def show_layout(shape, dtype):
    x = jnp.zeros(shape, dtype)
    fmt = None
    for attr in ("format", "layout"):
        try:
            fmt = getattr(x, attr)
            break
        except Exception:
            continue
    print(f"{str(shape):>24} {dtype.__name__:>6}: {fmt}")
    del x


for shape in [(L, B, NA, CL, DA), (L, B, CL, NA * DA), (L, B, NA * DA, CL),
              (L, B, NA, CL)]:
    show_layout(shape, jnp.int8)
show_layout((L, B, NA, CL, DA), jnp.bfloat16)


def timed_sum(shape, n=5):
    x = jnp.zeros(shape, jnp.int8)

    @jax.jit
    def f(x):
        return jnp.sum(x.astype(jnp.int32))

    jax.block_until_ready(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(x)
        _ = int(r)  # host fence
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


bytes_logical = L * B * NA * CL * DA
for name, shape in [("(L,B,NA,CL,16)", (L, B, NA, CL, DA)),
                    ("(L,B,CL,128)  ", (L, B, CL, NA * DA)),
                    ("(L,B,128,CL)  ", (L, B, NA * DA, CL))]:
    t = timed_sum(shape)
    print(f"sum {name}: {t*1e3:7.3f} ms  -> {bytes_logical/t/1e9:7.1f} GB/s "
          f"apparent")
