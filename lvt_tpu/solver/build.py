"""Optimizers and LR schedules (reference: vidgen/solver/build.py,
lr_scheduler.py) on optax.

Parity notes:
* Adam — optax.scale_by_adam with eps=1e-8/eps_root=0 matches torch.optim.Adam
  exactly (bias-corrected moments, eps added outside the sqrt).
* RMSprop — torch's update is v <- a*v + (1-a)*g^2; buf <- mu*buf + g/(sqrt(v)+eps);
  p -= lr*buf. optax.rmsprop puts eps *inside* the sqrt and orders momentum
  differently, so we implement the torch recurrence directly
  (``scale_by_torch_rmsprop``) — the shipped VT configs train with
  momentum=0.9, where the difference is real.
* Weight decay — reference builds per-param groups with separate decay for
  norm weights and biases (solver/build.py:12-43). We apply decay through a
  pytree mask keyed on parameter path (bias-like leaf names / norm scales).
  All shipped configs use decay 0 everywhere.
* Schedules — multiplicative factor on the base lr: Identity,
  WarmupMultiStepLR, WarmupCosineLR with constant/linear warmup
  (lr_scheduler.py:17-117).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class TorchRmspropState(NamedTuple):
    v: optax.Updates
    buf: optax.Updates


def scale_by_torch_rmsprop(alpha: float, momentum: float, eps: float = 1e-8):
    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return TorchRmspropState(v=z, buf=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        v = jax.tree_util.tree_map(
            lambda vi, g: alpha * vi + (1 - alpha) * (g * g), state.v, updates)
        scaled = jax.tree_util.tree_map(
            lambda g, vi: g / (jnp.sqrt(vi) + eps), updates, v)
        if momentum > 0:
            buf = jax.tree_util.tree_map(
                lambda b, s: momentum * b + s, state.buf, scaled)
            out = buf
        else:
            buf = state.buf
            out = scaled
        return out, TorchRmspropState(v=v, buf=buf)

    return optax.GradientTransformation(init_fn, update_fn)


def cast_opt_state(tx: optax.GradientTransformation,
                   dtype) -> optax.GradientTransformation:
    """Store the optimizer state's float leaves in `dtype` (e.g. bf16 —
    halves optimizer HBM and its read/write traffic per step), computing
    each update in fp32: state is upcast before the wrapped update and the
    new state rounded back after. Integer leaves (step counts) untouched.

    Tradeoff: the second-moment EMA accumulates (1-alpha)*g^2 increments
    into a rounded accumulator; bf16's 8 mantissa bits lose small updates
    fp32 would keep. Acceptable drift for RMSprop/Adam-style normalizers
    in practice — opt in via SOLVER.OPT_STATE_DTYPE."""
    dtype = jnp.dtype(dtype)

    def _down(x):
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    def _up(x):
        return (x.astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.floating) else x)

    def init_fn(params):
        return jax.tree_util.tree_map(_down, tx.init(params))

    def update_fn(updates, state, params=None):
        out, new_state = tx.update(updates,
                                   jax.tree_util.tree_map(_up, state), params)
        return out, jax.tree_util.tree_map(_down, new_state)

    return optax.GradientTransformation(init_fn, update_fn)


def _warmup_factor(method: str, it, warmup_iters: int, warmup_factor: float):
    """reference lr_scheduler.py:91-117; returns an array factor."""
    if warmup_iters <= 0:
        return jnp.asarray(1.0)
    if method == "constant":
        f = jnp.asarray(warmup_factor)
    elif method == "linear":
        alpha = it / warmup_iters
        f = warmup_factor * (1 - alpha) + alpha
    else:
        raise ValueError(f"Unknown warmup method: {method}")
    return jnp.where(it >= warmup_iters, 1.0, f)


def build_lr_schedule(cfg) -> Callable:
    """Returns schedule(step) -> multiplicative lr factor (base lr excluded)."""
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "Identity":
        return lambda step: jnp.asarray(1.0)

    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_method = cfg.SOLVER.WARMUP_METHOD

    if name == "WarmupMultiStepLR":
        milestones = list(cfg.SOLVER.STEPS)
        assert milestones == sorted(milestones)
        gamma = cfg.SOLVER.GAMMA
        ms = jnp.asarray(milestones or [np.iinfo(np.int32).max])

        def schedule(step):
            w = _warmup_factor(warmup_method, step, warmup_iters, warmup_factor)
            n_passed = jnp.sum(step >= ms) if milestones else 0
            return w * (gamma ** n_passed)

        return schedule

    if name == "WarmupCosineLR":
        max_iters = cfg.SOLVER.MAX_ITER

        def schedule(step):
            w = _warmup_factor(warmup_method, step, warmup_iters, warmup_factor)
            return w * 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_iters))

        return schedule

    raise ValueError(f"Unknown LR scheduler: {name}")


def _trailing_name(path) -> str:
    """Last dict/attr key of a leaf path, skipping list indices — the
    predictor's U_b/P_b biases are Python lists, so their leaves end in a
    SequenceKey (reference grouping keys on the torch param NAME 'bias',
    solver/build.py:39-40, which list indices must not mask)."""
    for p in reversed(path):
        name = getattr(p, "key", getattr(p, "name", None))
        if isinstance(name, str):
            return name
    return ""


def _is_bias_path(path) -> bool:
    return _trailing_name(path) in (
        "b", "bias", "ctx_bias", "conv_b", "ln_bias", "ffn_ln_bias",
        "ffn_b1", "ffn_b2", "P_b", "U_b")


def _is_norm_path(path) -> bool:
    # GetAttrKey (NamedTuple fields like BlockAttnParams.ln_scale) exposes
    # `.name`, DictKey `.key` — reading only `.key` silently dropped every
    # in-layer norm param into the base/bias decay groups (caught by
    # tests/test_trajectory_parity.py against torch's module-based grouping)
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return any(n in ("ln_scale", "ln_bias", "ffn_ln_scale", "ffn_ln_bias",
                     "scale") for n in names if isinstance(n, str))


def _norm_bias_keypaths(params) -> set:
    """Key-paths of 'bias' leaves living in a norm param dict (exactly
    {'scale', 'bias'} — the init_norm layout; 'scale' is used as a param
    key nowhere else). The reference assigns ALL params of a norm MODULE
    to the NORM decay group, its bias included (reference
    solver/build.py:36-40 checks the module type before the name) — a
    per-leaf path check cannot see the sibling 'scale', so this prepass
    walks the tree once at trace time. Note one documented corner:
    FrozenBN keeps scale/bias in params for checkpoint-layout parity with
    gradients stopped; the reference excludes frozen params from the
    optimizer entirely, so with a NONZERO norm decay ours would still
    decay them (no shipped config sets both)."""
    found = set()

    def walk(node, path):
        if isinstance(node, dict):
            if set(node.keys()) == {"scale", "bias"}:
                found.add(path + ("bias",))
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params, ())
    return found


def _keypath_tuple(path) -> tuple:
    """jax tree path -> hashable (str-or-int, ...) matching _norm_bias_
    keypaths' walk (DictKey.key / GetAttrKey.name / SequenceKey.idx)."""
    out = []
    for p in path:
        name = getattr(p, "key", getattr(p, "name", None))
        out.append(name if isinstance(name, str) else getattr(p, "idx", name))
    return tuple(out)


def build_optimizer(cfg, suffix: str = "_G") -> optax.GradientTransformation:
    """Optimizer with the reference's hyperparameter suffix scheme
    (solver/build.py:46-74) and schedule baked in."""
    S = cfg.SOLVER
    lr = getattr(S, "LR" + suffix)
    wd_base = getattr(S.WEIGHT_DECAY, "BASE" + suffix)
    wd_bias = getattr(S.WEIGHT_DECAY, "BIAS" + suffix)
    wd_norm = getattr(S.WEIGHT_DECAY, "NORM" + suffix)

    chain = []
    if any(w != 0.0 for w in (wd_base, wd_bias, wd_norm)):
        def add_decay(updates, state, params=None):
            assert params is not None
            norm_biases = _norm_bias_keypaths(params)

            def decayed(path, g, p):
                if _is_norm_path(path) or _keypath_tuple(path) in norm_biases:
                    wd = wd_norm
                elif _is_bias_path(path):
                    wd = wd_bias
                else:
                    wd = wd_base
                return g + wd * p

            upd = jax.tree_util.tree_map_with_path(decayed, updates, params)
            return upd, state

        chain.append(optax.GradientTransformation(lambda p: (), add_decay))

    name = S.OPTIMIZER_NAME
    if name == "adam":
        b1 = getattr(S.ADAM, "BETA1" + suffix)
        b2 = getattr(S.ADAM, "BETA2" + suffix)
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8, eps_root=0.0))
    elif name == "rmsprop":
        alpha = getattr(S.RMSPROP, "ALPHA" + suffix)
        momentum = getattr(S.RMSPROP, "MOMENTUM" + suffix)
        chain.append(scale_by_torch_rmsprop(alpha, momentum))
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    schedule = build_lr_schedule(cfg)
    # optax's count increments once per optimizer.update; under gradient
    # accumulation the trainer calls update only every A-th iteration while
    # WARMUP_ITERS/STEPS/MAX_ITER are iteration-denominated — rescale the
    # count so schedules fire at the configured iterations, not A× late
    accum = cfg.SOLVER.ACCUMULATION_STEPS
    chain.append(optax.scale_by_schedule(
        lambda step: -lr * schedule(step * accum)))
    tx = optax.chain(*chain)
    state_dtype = getattr(S, "OPT_STATE_DTYPE", "float32")
    if state_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"SOLVER.OPT_STATE_DTYPE must be 'float32' or 'bfloat16', "
            f"got {state_dtype!r}")
    if state_dtype != "float32":
        tx = cast_opt_state(tx, jnp.bfloat16)
    return tx
