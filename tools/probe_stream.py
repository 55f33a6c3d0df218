"""Dtype-dependent HBM stream rate on v5e, in-scan. One shape per run:
python tools/probe_stream.py f32|bf16|int8|int8small"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

which = sys.argv[1]
shape, dtype = {
    "f32": ((4096, 8192), jnp.float32),
    "bf16": ((8192, 8192), jnp.bfloat16),
    "int8": ((16384, 8192), jnp.int8),
    "int8small": ((4096, 8192), jnp.int8),
}[which]

x = jnp.ones(shape, dtype)
@jax.jit
def f(x):
    def body(acc, _):
        return acc + jnp.sum(x.astype(jnp.float32)), ()
    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
    return s
jax.block_until_ready(f(x))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r = f(x)
    _ = float(r)
    ts.append(time.perf_counter() - t0)
t = float(np.median(ts)) / 20
byt = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
print(f"{which} {shape}: {t*1e6:8.1f} us/read, {byt/t/1e9:7.1f} GB/s")
