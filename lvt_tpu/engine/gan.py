"""GAN-aware trainer (reference: vidgen/engine/trainer.py:88-121).

The reference gates alternating generator/discriminator updates on
SOLVER.D_UPDATE_RATIO / D_INIT_ITERS / SUPERVISED_MAX_ITER but ships no
discriminator module (SURVEY.md §2.5) — the path is scaffolding. We rebuild
the same schedule TPU-natively for models that DO provide both sides:

  model.train_loss(params, state, batch, rng)    — supervised/generator loss
  model.generator_loss(params, d_params, state, batch, rng)
  model.discriminator_loss(params, d_params, state, batch, rng)

Schedule parity (trainer.py:88-121):
  * iter < SUPERVISED_MAX_ITER (if >= 0): plain supervised updates;
  * else: D steps every iteration; G steps only every D_UPDATE_RATIO
    iterations and only once iter >= D_INIT_ITERS.
"""

import logging
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..solver import build_optimizer
from .trainer import Trainer, TrainState

logger = logging.getLogger(__name__)


class GanTrainState(NamedTuple):
    g: TrainState
    d_params: Any
    d_opt_state: Any


class GanTrainer(Trainer):
    """Alternating G/D trainer. ``model`` must expose generator_loss /
    discriminator_loss; ``d_params`` comes from model.init_discriminator."""

    def __init__(self, cfg, data_loader, model=None, mesh=None):
        super().__init__(cfg, data_loader, model=model, mesh=mesh)
        assert hasattr(self.model, "discriminator_loss"), (
            "GAN_MODE_ON needs a model with a discriminator; the reference "
            "ships none (vidgen has no discriminator module)")
        assert cfg.SOLVER.ACCUMULATION_STEPS == 1, (
            "GanTrainer calls optimizer.update every iteration and does not "
            "implement gradient accumulation; its LR-schedule count scaling "
            "(solver/build.py) would also be wrong with A > 1")
        self.d_update_ratio = cfg.SOLVER.D_UPDATE_RATIO
        self.d_init_iters = cfg.SOLVER.D_INIT_ITERS
        self.supervised_max_iter = cfg.SOLVER.SUPERVISED_MAX_ITER

        # derive from the seed the base trainer actually used (drawn fresh
        # when cfg.SEED <= 0), keeping G and D inits consistent
        d_params = self.model.init_discriminator(jax.random.key(self.seed + 7))
        self.d_optimizer = build_optimizer(cfg, suffix="_D")
        self.d_opt_state = self.d_optimizer.init(d_params)
        self.d_params = d_params

        self._g_step = jax.jit(self._make_g_step())
        self._d_step = jax.jit(self._make_d_step())

    def _make_g_step(self):
        model, optimizer = self.model, self.optimizer

        def step(state: TrainState, d_params, batch, base_rng):
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(params):
                loss, (metrics, ms) = model.generator_loss(
                    params, d_params, state.model_state, batch, rng)
                return loss, (metrics, ms)

            grads, (metrics, ms) = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state._replace(params=params, model_state=ms,
                                  opt_state=new_opt, step=state.step + 1), metrics

        return step

    def _make_d_step(self):
        model, d_optimizer = self.model, self.d_optimizer

        def step(state: TrainState, d_params, d_opt_state, batch, base_rng):
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(dp):
                loss, metrics = model.discriminator_loss(
                    state.params, dp, state.model_state, batch, rng)
                return loss, metrics

            grads, metrics = jax.grad(loss_fn, has_aux=True)(d_params)
            updates, new_opt = d_optimizer.update(grads, d_opt_state, d_params)
            return optax.apply_updates(d_params, updates), new_opt, metrics

        return step

    def run_step(self):
        import time

        start = time.perf_counter()
        batch = self._put_batch(next(self._data_loader_iter))
        data_time = time.perf_counter() - start

        it = self.iter
        metrics = {}
        if 0 <= self.supervised_max_iter and it < self.supervised_max_iter:
            self.state, m = self._train_step(self.state, batch, self._step_key)
            metrics.update(m)
        else:
            self.d_params, self.d_opt_state, md = self._d_step(
                self.state, self.d_params, self.d_opt_state, batch, self._step_key)
            metrics.update(md)
            if it % self.d_update_ratio == 0 and it >= self.d_init_iters:
                self.state, mg = self._g_step(self.state, self.d_params, batch,
                                              self._step_key)
                metrics.update(mg)
            else:
                self.state = self.state._replace(step=self.state.step + 1)

        self._pending_metrics.append((self.iter, data_time, metrics))
        if len(self._pending_metrics) >= self.metrics_period:
            self.flush_metrics()

    def checkpoint_tree(self):
        tree = super().checkpoint_tree()
        tree["d_params"] = self.d_params
        tree["d_opt_state"] = self.d_opt_state
        return tree
