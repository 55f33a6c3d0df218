"""Golden-value regression anchors: fixed-seed model outputs recorded at
round 1 (CPU fp32). These catch *unintended* numeric drift from refactors;
if a change intentionally alters numerics, update the constants and say why
in the commit."""

import jax
import jax.numpy as jnp
import numpy as np

from lvt_tpu.models.vqvae import VQVAE
from lvt_tpu.models.vt import VideoTransformer, vt_logits


def test_vt_logits_golden(rng):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_vt import _tiny_cfg

    m = VideoTransformer(_tiny_cfg(), T=4, H=4, W=4)
    params, _ = m.init(jax.random.key(0))
    r = np.random.default_rng(42)
    video = jnp.asarray(r.integers(0, m.c.nv, size=(2, m.c.nc, 4, 4, 4)), jnp.int32)
    sidx = jnp.asarray([1, 2], jnp.int32)
    ctx, sl, _ = m.prepare_slices(video, sidx)
    lg = np.asarray(vt_logits(params["netG"], m.c, ctx, sl, sidx, use_pallas=False),
                    np.float64)

    np.testing.assert_allclose(lg.sum(), 248.94882887601852, rtol=1e-4)
    np.testing.assert_allclose(np.abs(lg).sum(), 398.7718734294176, rtol=1e-4)
    np.testing.assert_allclose(
        lg[0, 0, 2, 2, 0],
        [2.188746690750122, -0.0034209787845611572, 1.2013424634933472,
         -0.19031667709350586, 0.5479117035865784, 0.8754984140396118,
         0.002518683671951294, 0.8418647050857544],
        rtol=1e-4, atol=1e-5)

    loss, _ = m.loss(params, {"video": video}, jax.random.key(9))
    np.testing.assert_allclose(float(loss), 2.5049142837524414, rtol=1e-4)


def test_vqvae_golden(rng):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_vqvae import _small_cfg

    vq = VQVAE(_small_cfg())
    params, state = vq.init(jax.random.key(0))
    r = np.random.default_rng(42)
    _ = r.integers(0, 8, size=(2, 2, 4, 4, 4))  # keep the stream aligned
    x = jnp.asarray(r.standard_normal((2, 32, 32, 3)).astype(np.float32))
    recon, idx = vq.reconstruct(params, state, x)
    np.testing.assert_allclose(
        float(np.asarray(recon, np.float64).sum()), 0.4494245696021153, atol=2e-2)
    # codebook indices are the bit-parity anchor: exact
    assert int(np.asarray(idx).sum()) == 120226
