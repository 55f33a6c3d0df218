"""The jitted trainer (reference: vidgen/engine/trainer.py, defaults.py).

TPU-native redesign: instead of DDP + per-GPU processes + loss.backward(),
there is ONE jitted ``train_step(state, batch, rng) -> (state, metrics)``
compiled over a (data, model) mesh. The batch is sharded over the data axis,
params/optimizer state are replicated (or model-sharded via NamedSharding),
and XLA inserts the gradient/EMA collectives that DDP + the reference's
AllReduce autograd Function did by hand.

Gradient accumulation follows the reference semantics exactly: gradients are
*summed* across ACCUMULATION_STEPS consecutive batches and applied once
(engine/trainer.py:78-87 calls backward every iter, optimizer.step every A).

Metrics leave the device lazily (flushed every ``metrics_period`` steps) so
the step dispatch pipeline never blocks on host reads; the non-finite-loss
guard (reference defaults.py:273-279) runs at flush time.
"""

import logging
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import latest_checkpoint, load_checkpoint
from ..models import build_model, param_count
from ..parallel.mesh import batch_sharding, mesh_from_cfg, replicated
from ..solver import build_optimizer
from ..utils.env import seed_all_rng
from .train_loop import TrainerBase

logger = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    accum_grads: Any  # zeros-like params when ACCUMULATION_STEPS > 1, else None
    step: jnp.ndarray


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_zeros_like(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def make_train_step(model, optimizer, accumulation_steps: int = 1,
                    compute_dtype=None):
    """Build the pure train step; jit it with donated state.

    compute_dtype=bfloat16 runs the forward/backward with bf16 weights and
    activations while the fp32 master params/optimizer state stay authoritative
    (the cast's VJP returns fp32 gradients) — the standard TPU mixed-precision
    recipe; losses/softmax internals are computed in fp32 by the models.
    """
    from ..models import cast_floats

    def train_step(state: TrainState, batch, base_rng):
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            p = params if compute_dtype is None else cast_floats(params, compute_dtype)
            loss, (metrics, new_mstate) = model.train_loss(
                p, state.model_state, batch, rng)
            return loss.astype(jnp.float32), (metrics, new_mstate)

        grads, (metrics, new_mstate) = jax.grad(loss_fn, has_aux=True)(state.params)

        if accumulation_steps == 1:
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_accum = None
        else:
            acc = _tree_add(state.accum_grads, grads)
            do_update = (state.step + 1) % accumulation_steps == 0

            def apply_fn(operand):
                params, opt_state, acc = operand
                updates, new_opt = optimizer.update(acc, opt_state, params)
                return (optax.apply_updates(params, updates), new_opt,
                        _tree_zeros_like(acc))

            def skip_fn(operand):
                params, opt_state, acc = operand
                return params, opt_state, acc

            new_params, new_opt, new_accum = jax.lax.cond(
                do_update, apply_fn, skip_fn,
                (state.params, state.opt_state, acc))

        new_state = TrainState(
            params=new_params, model_state=new_mstate, opt_state=new_opt,
            accum_grads=new_accum, step=state.step + 1)
        return new_state, metrics

    return train_step


class Trainer(TrainerBase):
    """End-to-end trainer for any meta-arch exposing init/train_loss
    (reference Trainer, engine/trainer.py:9-128). The GAN-gated variant of
    run_step lives in engine/gan.py (GanTrainer)."""

    def __init__(self, cfg, data_loader, model=None, mesh=None):
        super().__init__()
        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        self.mesh = mesh if mesh is not None else mesh_from_cfg(cfg)
        self.metrics_period = 20

        # SEED <= 0 means "draw a fresh seed" (reference convention,
        # utils/env.seed_all_rng); a fixed fallback would make every
        # default-config run bitwise identical
        seed = cfg.SEED if cfg.SEED > 0 else seed_all_rng(-1)
        self.seed = seed  # the seed actually used (drawn when cfg.SEED <= 0)
        init_key = jax.random.key(seed)
        self._step_key = jax.random.key(seed + 1)

        params, mstate = self.model.init(init_key)
        self.optimizer = build_optimizer(cfg, suffix="_G")
        opt_state = self.optimizer.init(params)

        accum = cfg.SOLVER.ACCUMULATION_STEPS
        accum_grads = _tree_zeros_like(params) if accum > 1 else None
        state = TrainState(params=params, model_state=mstate,
                           opt_state=opt_state, accum_grads=accum_grads,
                           step=jnp.zeros((), jnp.int32))
        self.state = self._place_state(state)
        self._step_key = jax.device_put(self._step_key, replicated(self.mesh))
        self._batch_sharding = batch_sharding(self.mesh)

        cdt = cfg.TPU.COMPUTE_DTYPE
        compute_dtype = None if cdt in ("", "float32") else jnp.dtype(cdt)
        self._train_step = jax.jit(
            make_train_step(self.model, self.optimizer, accum,
                            compute_dtype=compute_dtype),
            donate_argnums=(0,))

        self._data_loader = data_loader
        self._data_loader_iter = iter(data_loader)
        self._pending_metrics = []

        n = param_count(params)
        logger.info(f"Model has {n / 1e6:.2f}M parameters; "
                    f"mesh {self.mesh.shape}; accumulation={accum}")

    def _place_state(self, state: TrainState) -> TrainState:
        """Lay the train state out on the mesh: replicated when the model
        axis is trivial, tensor-parallel (parallel/sharding.py rules) when
        TPU.MESH_MODEL > 1. Used at init and again after checkpoint restore
        so resumed state keeps the same layout."""
        from ..parallel.mesh import MODEL_AXIS
        from ..parallel.sharding import shard_tree, sharded_field_names

        if dict(self.mesh.shape).get(MODEL_AXIS, 1) > 1:
            placed = shard_tree(self.mesh, state)
            fields = (sharded_field_names(self.mesh, state.params)
                      | sharded_field_names(self.mesh, state.model_state))
            logger.info(f"Tensor-parallel fields: {sorted(fields)}")
            return placed
        return jax.device_put(state, replicated(self.mesh))

    # -- step ---------------------------------------------------------------
    def run_step(self):
        start = time.perf_counter()
        batch = next(self._data_loader_iter)
        batch = self._put_batch(batch)
        data_time = time.perf_counter() - start

        vis_period = self.cfg.VIS_PERIOD
        if (vis_period > 0 and self.iter > 0 and self.iter % vis_period == 0
                and hasattr(self.model, "visualize_training")):
            # reference ae.py:101-108 / vt.py:186-189: periodic image dumps
            try:
                images = self.model.visualize_training(
                    self.state.params, self.state.model_state, batch)
                for name, img in images.items():
                    self.storage.put_image(name, img)
            except Exception as e:  # vis must never kill training
                logger.warning(f"visualize_training failed: {e}")

        self.state, metrics = self._train_step(self.state, batch, self._step_key)
        # flushed by after_step every metrics_period iterations (and at the
        # final iteration) — metrics stay device-side until then so the
        # host sync never paces the step
        self._pending_metrics.append((self.iter, data_time, metrics))

    def _put_batch(self, batch):
        """Move numeric batch fields onto the mesh; drop host-side metadata
        (file names, video indices) the jitted step cannot take.

        With TPU.SHARD_SPATIAL, image batches (b, H, W, C) additionally
        shard their row axis over the model axis (sequence/spatial
        parallelism for the conv stage; parallel.mesh.spatial_batch_sharding).
        """
        sp = bool(getattr(self.cfg.TPU, "SHARD_SPATIAL", False))
        if sp and not hasattr(self, "_spatial_sharding"):
            from ..parallel.mesh import spatial_batch_sharding

            self._spatial_sharding = spatial_batch_sharding(self.mesh)
        if not hasattr(self, "_narrow_i16"):
            # code/class vocabularies are config-bounded: when they fit
            # int16, ship those int32 batch fields across the host->device
            # link at half width and cast back on device (exact — values
            # < 2^15 round-trip bit-identically). Halves the dominant
            # transport bytes of the VT pipeline on any link; decisive on
            # this rig's ~18 MB/s tunnel (tools/bench_pipeline.py h2d rows)
            vt_cfg = self.cfg.MODEL.AUTOREGRESSIVE.VT
            self._i16_bounds = {
                k: bound for k, bound in (("video", vt_cfg.NV),
                                          ("class", vt_cfg.CLASS_NUM))
                if 0 < bound < 2 ** 15}
            self._narrow_i16 = set(self._i16_bounds)
            self._i16_checked = set()
        out = {}
        for k, v in batch.items():
            arr = np.asarray(v) if not isinstance(v, jnp.ndarray) else v
            if getattr(arr, "dtype", None) is not None and np.issubdtype(arr.dtype, np.number):
                sharding = self._batch_sharding
                if sp and k == "image" and arr.ndim == 4:
                    sharding = self._spatial_sharding
                if (k in self._narrow_i16 and arr.dtype == np.int32
                        and not isinstance(v, jnp.ndarray)):
                    if k not in self._i16_checked:
                        # one-time host guard (ADVICE r4): the narrowing
                        # trusts the config bound; actual out-of-range codes
                        # (e.g. latents from a larger-codebook VQ-VAE fed to
                        # a mismatched VT config) would silently wrap at
                        # int16 and corrupt data before the loss. Checked on
                        # the first batch per key — a config mismatch is
                        # systematic, not per-batch.
                        lo, hi = int(arr.min()), int(arr.max())
                        bound = self._i16_bounds[k]
                        if lo < 0 or hi >= bound:
                            raise ValueError(
                                f"batch field '{k}' has values in [{lo}, "
                                f"{hi}] but the config bounds it to [0, "
                                f"{bound}) — mismatched dataset/config "
                                f"(int16 transport would wrap silently)")
                        self._i16_checked.add(k)
                    out[k] = jax.device_put(
                        jnp.asarray(arr.astype(np.int16)),
                        sharding).astype(jnp.int32)
                else:
                    out[k] = jax.device_put(jnp.asarray(arr), sharding)
        return out

    def flush_metrics(self):
        pending, self._pending_metrics = self._pending_metrics, []
        for it, data_time, metrics in pending:
            host = {k: float(v) for k, v in metrics.items()}
            total = sum(host.values())
            if not np.isfinite(total):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={it}! "
                    f"loss_dict={host}")
            saved = self.storage.iter
            self.storage.iter = it
            self.storage.put_scalars(total_loss=total, **host)
            self.storage.put_scalar("data_time", data_time)
            self.storage.iter = saved

    def after_step(self):
        # make metrics current before periodic writers run
        if (self.iter + 1) % self.metrics_period == 0 or self.iter == self.max_iter - 1:
            self.flush_metrics()
        super().after_step()

    # -- checkpoint ---------------------------------------------------------
    def checkpoint_tree(self):
        tree = {"params": self.state.params,
                "model_state": self.state.model_state,
                "opt_state": self.state.opt_state,
                "step": self.state.step}
        if self.state.accum_grads is not None:
            # mid-accumulation-window resumes must not drop the partial
            # gradient sum (checkpoint period need not divide A)
            tree["accum_grads"] = self.state.accum_grads
        return tree

    def resume_or_load(self, resume: bool = True) -> int:
        """Returns the start iteration (restored on resume — fixing the
        reference's dropped start_iter, defaults.py:186-191)."""
        if not resume:
            return 0
        path = latest_checkpoint(self.cfg.OUTPUT_DIR)
        if path is None:
            return 0
        restored = load_checkpoint(path, self.checkpoint_tree())
        self.state = self._place_state(self.state._replace(
            params=restored["params"], model_state=restored["model_state"],
            opt_state=restored["opt_state"],
            accum_grads=restored.get("accum_grads", self.state.accum_grads),
            step=jnp.asarray(restored["step"])))
        start = int(restored["step"])
        logger.info(f"Resumed from {path} at iteration {start}")
        return start

    def train(self, start_iter: Optional[int] = None, max_iter: Optional[int] = None):
        if start_iter is None:
            start_iter = int(self.state.step)
        if max_iter is None:
            max_iter = self.cfg.SOLVER.MAX_ITER
        super().train(start_iter, max_iter)
