"""GAN-aware trainer schedule parity (reference trainer.py:88-121 gating) on
a toy 1-D GAN: supervised phase first, then D every step / G every
d_update_ratio steps after d_init_iters; the toy GAN actually learns."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from lvt_tpu.config import get_cfg
from lvt_tpu.engine.gan import GanTrainer
from lvt_tpu.models.loss import gan_loss
from lvt_tpu.parallel.mesh import build_mesh


class ToyGan:
    """G: 2-layer MLP noise->sample; D: 2-layer MLP sample->logit.
    Tracks call counts through traced-side metrics."""

    def __init__(self, cfg):
        self.cfg = cfg

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = {"w1": jax.random.normal(k1, (4, 16)) * 0.5,
                  "w2": jax.random.normal(k2, (16, 2)) * 0.5,
                  "b2": jnp.zeros((2,))}
        return params, {}

    def init_discriminator(self, key):
        k1, k2 = jax.random.split(key)
        return {"w1": jax.random.normal(k1, (2, 16)) * 0.5,
                "w2": jax.random.normal(k2, (16, 1)) * 0.5}

    def _gen(self, params, rng, n):
        z = jax.random.normal(rng, (n, 4))
        return jnp.tanh(z @ params["w1"]) @ params["w2"] + params["b2"]

    def _disc(self, d_params, x):
        return (jnp.tanh(x @ d_params["w1"]) @ d_params["w2"])[:, 0]

    def train_loss(self, params, state, batch, rng, **_):
        # supervised pretrain phase: moment-match the generator
        fake = self._gen(params, rng, batch["x"].shape[0])
        loss = jnp.mean((jnp.mean(fake, 0) - jnp.mean(batch["x"], 0)) ** 2)
        return loss, ({"loss_sup": loss}, state)

    def generator_loss(self, params, d_params, state, batch, rng):
        fake = self._gen(params, rng, batch["x"].shape[0])
        loss = gan_loss(self.cfg, self._disc(d_params, fake), True)
        return loss, ({"loss_g": loss}, state)

    def discriminator_loss(self, params, d_params, state, batch, rng):
        fake = self._gen(params, rng, batch["x"].shape[0])
        loss = (gan_loss(self.cfg, self._disc(d_params, batch["x"]), True)
                + gan_loss(self.cfg, self._disc(d_params, jax.lax.stop_gradient(fake)), False))
        return loss, {"loss_d": loss}


def test_gan_trainer_schedule_and_learning(rng, tmp_path):
    cfg = get_cfg()
    cfg.GAN_MODE_ON = True
    cfg.LOSS.GAN.MODE = "lsgan"
    cfg.SOLVER.OPTIMIZER_NAME = "adam"
    cfg.SOLVER.ADAM.BETA2_G = 0.999
    cfg.SOLVER.ADAM.BETA2_D = 0.999
    cfg.SOLVER.LR_G = 1e-2
    cfg.SOLVER.LR_D = 2e-2
    cfg.SOLVER.SUPERVISED_MAX_ITER = 5
    cfg.SOLVER.D_UPDATE_RATIO = 2
    cfg.SOLVER.D_INIT_ITERS = 7
    cfg.SOLVER.IMS_PER_BATCH = 64
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SEED = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"

    target_mean = np.array([2.0, -1.0], np.float32)

    class L:
        def __iter__(self):
            r = np.random.default_rng(0)
            while True:
                yield {"x": (r.standard_normal((64, 2)) * 0.3 + target_mean).astype(np.float32)}

    mesh = build_mesh(data=1, model=1, devices=jax.devices()[:1])
    trainer = GanTrainer(cfg, L(), model=ToyGan(cfg), mesh=mesh)
    trainer.metrics_period = 1
    fake0 = trainer.model._gen(trainer.state.params, jax.random.key(123), 512)
    init_dist = np.linalg.norm(np.asarray(fake0).mean(0) - target_mean)
    trainer.train(0, 400)
    trainer.flush_metrics()

    hists = trainer.storage.histories()
    # supervised phase ran exactly 5 iters
    assert len(hists["loss_sup"].values()) == 5
    # D ran on every non-supervised iter
    assert len(hists["loss_d"].values()) == 395
    # G ran only on even iters >= d_init_iters (8, 10, ..., 58)
    assert len(hists["loss_g"].values()) == len([i for i in range(5, 400)
                                                 if i % 2 == 0 and i >= 7])
    # the adversarial updates moved the sample mean toward the target
    fake = trainer.model._gen(trainer.state.params, jax.random.key(123), 512)
    got_dist = np.linalg.norm(np.asarray(fake).mean(0) - target_mean)
    assert got_dist < init_dist * 0.9, (got_dist, init_dist)
