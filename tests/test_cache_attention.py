"""The int8 cache-attention Pallas experiment must stay correct (interpret
mode); see lvt_tpu/ops/cache_attention.py for the measured verdict."""

import jax.numpy as jnp
import numpy as np

from lvt_tpu.ops.cache_attention import cache_attention_pallas, cache_attention_xla


def test_cache_attention_kernel_matches_xla(rng):
    b, na, CL, da = 2, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, na, da)).astype(np.float32))
    k8 = jnp.asarray(rng.integers(-127, 128, size=(b, na, CL, da)).astype(np.int8))
    v8 = jnp.asarray(rng.integers(-127, 128, size=(b, na, CL, da)).astype(np.int8))
    ks = jnp.asarray(np.abs(rng.standard_normal((b, na, CL))).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.standard_normal((b, na, CL))).astype(np.float32) * 0.01)
    extra = jnp.asarray(rng.standard_normal((b, na, CL)).astype(np.float32))
    scale = 1 / np.sqrt(da)
    ref = np.asarray(cache_attention_xla(q, k8, ks, v8, vs, extra, scale))
    got = np.asarray(cache_attention_pallas(q, k8, ks, v8, vs, extra, scale,
                                            interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
