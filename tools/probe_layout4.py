"""Raw int8 cache stream rate, in-scan (ceiling for a decode kernel)."""
import time
import jax, jax.numpy as jnp, numpy as np

L, B, NA, CL, DA = 8, 256, 8, 256, 16
LOGICAL = 2 * L * B * NA * CL * DA

kc = jnp.zeros((L, B, NA, CL, DA), jnp.int8)
vc = jnp.zeros((L, B, NA, CL, DA), jnp.int8)

@jax.jit
def f(kc, vc):
    def body(acc, _):
        s = acc + jnp.sum(kc.astype(jnp.int32)) + jnp.sum(vc.astype(jnp.int32))
        return s, ()
    s, _ = jax.lax.scan(body, jnp.int32(0), None, length=20)
    return s

jax.block_until_ready(f(kc, vc))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r = f(kc, vc)
    _ = int(r)
    ts.append(time.perf_counter() - t0)
t = float(np.median(ts)) / 20
print(f"pure reduce: {t*1e6:7.1f} us/step, {LOGICAL/t/1e9:7.1f} GB/s")
