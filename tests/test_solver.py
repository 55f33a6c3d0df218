"""Solver parity tests: RMSprop/Adam trajectories vs torch.optim on identical
gradient streams; LR schedule formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from lvt_tpu.config import get_cfg
from lvt_tpu.solver import build_lr_schedule, build_optimizer


def _run_jax(opt, p0, grads):
    p = jnp.asarray(p0)
    st = opt.init(p)
    for g in grads:
        upd, st = opt.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, upd)
    return np.asarray(p)


def _run_torch(torch_opt_fn, p0, grads):
    p = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch_opt_fn([p])
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    return p.detach().numpy()


def test_rmsprop_matches_torch(rng):
    """The DSFVT training optimizer: RMSprop lr 2e-5, alpha .95, momentum .9
    (configs/vt/DSFVT.yaml)."""
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
    cfg.SOLVER.LR_G = 2e-5
    cfg.SOLVER.RMSPROP.ALPHA_G = 0.95
    cfg.SOLVER.RMSPROP.MOMENTUM_G = 0.9
    opt = build_optimizer(cfg)

    p0 = rng.standard_normal((13,)).astype(np.float32)
    grads = [rng.standard_normal((13,)).astype(np.float32) for _ in range(25)]
    got = _run_jax(opt, p0, grads)
    want = _run_torch(
        lambda ps: torch.optim.RMSprop(ps, lr=2e-5, alpha=0.95, momentum=0.9),
        p0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_adam_matches_torch(rng):
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER_NAME = "adam"
    cfg.SOLVER.LR_G = 3e-4
    cfg.SOLVER.ADAM.BETA1_G = 0.9
    cfg.SOLVER.ADAM.BETA2_G = 0.9  # reference default BETA2_G
    opt = build_optimizer(cfg)

    p0 = rng.standard_normal((7,)).astype(np.float32)
    grads = [rng.standard_normal((7,)).astype(np.float32) for _ in range(20)]
    got = _run_jax(opt, p0, grads)
    want = _run_torch(
        lambda ps: torch.optim.Adam(ps, lr=3e-4, betas=(0.9, 0.9)),
        p0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_multistep_schedule():
    cfg = get_cfg()
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    cfg.SOLVER.STEPS = (10, 20)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.WARMUP_FACTOR = 0.5
    s = build_lr_schedule(cfg)
    # linear warmup: f = 0.5*(1-a)+a at a=it/5
    np.testing.assert_allclose(float(s(0)), 0.5)
    np.testing.assert_allclose(float(s(4)), 0.5 * (1 - 0.8) + 0.8)
    np.testing.assert_allclose(float(s(5)), 1.0)
    np.testing.assert_allclose(float(s(10)), 0.1)
    np.testing.assert_allclose(float(s(25)), 0.01)


def test_cosine_schedule():
    cfg = get_cfg()
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.WARMUP_ITERS = 0
    s = build_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-6)


def test_opt_state_dtype_bfloat16():
    """SOLVER.OPT_STATE_DTYPE='bfloat16' stores the optimizer state's float
    leaves in bf16 (halved optimizer memory) while the update trajectory
    stays close to fp32 state — the update math runs in fp32 either way."""
    import jax
    import jax.numpy as jnp

    from lvt_tpu.config import get_cfg

    def build(state_dtype):
        cfg = get_cfg()
        cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
        cfg.SOLVER.LR_G = 1e-3
        cfg.SOLVER.OPT_STATE_DTYPE = state_dtype
        return build_optimizer(cfg)

    params = {"w": jnp.ones((8, 8), jnp.float32),
              "b": jnp.zeros((8,), jnp.float32),
              "step_like_int": jnp.zeros((), jnp.int32)}
    tx16, tx32 = build("bfloat16"), build("float32")
    s16, s32 = tx16.init(params), tx32.init(params)
    f16 = [l.dtype for l in jax.tree_util.tree_leaves(s16)
           if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    assert f16 and all(d == jnp.bfloat16 for d in f16), f16
    # int leaves (if any) must not be cast
    ints = [l.dtype for l in jax.tree_util.tree_leaves(s16)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.integer)]
    assert all(jnp.issubdtype(d, jnp.integer) for d in ints)

    key = jax.random.key(0)
    p16 = p32 = params
    for i in range(5):
        key, sub = jax.random.split(key)
        g = jax.tree_util.tree_map(
            lambda p, k=sub: jax.random.normal(k, p.shape, jnp.float32)
            if jnp.issubdtype(p.dtype, jnp.floating) else jnp.zeros_like(p),
            params)
        u16, s16 = tx16.update(g, s16, p16)
        u32, s32 = tx32.update(g, s32, p32)
        p16 = optax.apply_updates(p16, u16)
        p32 = optax.apply_updates(p32, u32)
    # bf16 state rounds the normalizer; trajectories drift slightly but
    # must stay within ~1% of the fp32 update scale after 5 steps
    dw = float(jnp.max(jnp.abs(p16["w"] - p32["w"])))
    scale = float(jnp.max(jnp.abs(p32["w"] - params["w"])) + 1e-12)
    assert dw / scale < 0.05, (dw, scale)


def test_opt_state_dtype_validation():
    from lvt_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.SOLVER.OPT_STATE_DTYPE = "float16"
    with pytest.raises(ValueError, match="OPT_STATE_DTYPE"):
        build_optimizer(cfg)


def test_norm_module_bias_gets_norm_decay():
    """The reference assigns ALL params of a norm module to the NORM decay
    group — the module-type check precedes the name check (reference
    solver/build.py:36-40), so a BN/GN 'bias' takes weight_decay_norm, not
    weight_decay_bias. Our norm param dicts are exactly {'scale','bias'}
    (init_norm), so the decay router must treat such a dict's bias as norm.

    Trick: RMSprop with alpha=1.0 keeps v == 0 (v <- 1*v + 0*g^2), so with
    zero gradients the one-step update is -lr * (wd*p) / eps — directly
    proportional to the decay coefficient routed to each leaf."""
    wd_base, wd_bias, wd_norm = 0.5, 0.25, 0.125
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
    cfg.SOLVER.LR_G = 1.0
    cfg.SOLVER.RMSPROP.ALPHA_G = 1.0
    cfg.SOLVER.RMSPROP.MOMENTUM_G = 0.0
    cfg.SOLVER.WEIGHT_DECAY.BASE_G = wd_base
    cfg.SOLVER.WEIGHT_DECAY.BIAS_G = wd_bias
    cfg.SOLVER.WEIGHT_DECAY.NORM_G = wd_norm
    cfg.SOLVER.LR_SCHEDULER_NAME = "Identity"

    one = jnp.ones((3,))
    params = {"netE": [
        {"w": one, "b": one},                      # conv: base / bias
        {"scale": one, "bias": one},               # norm layer: BOTH norm
        {"w1": one, "n1": {"scale": one, "bias": one}},  # resblock norm
    ]}
    grads = jax.tree.map(jnp.zeros_like, params)
    opt = build_optimizer(cfg)
    updates, _ = opt.update(grads, opt.init(params), params)

    def wd_of(update):
        # update = -lr * wd * p / eps, lr=1, p=1, eps=1e-8
        return float(-np.asarray(update)[0]) * 1e-8

    got = {
        "w": wd_of(updates["netE"][0]["w"]),
        "b": wd_of(updates["netE"][0]["b"]),
        "norm.scale": wd_of(updates["netE"][1]["scale"]),
        "norm.bias": wd_of(updates["netE"][1]["bias"]),
        "rb.w1": wd_of(updates["netE"][2]["w1"]),
        "rb.n1.scale": wd_of(updates["netE"][2]["n1"]["scale"]),
        "rb.n1.bias": wd_of(updates["netE"][2]["n1"]["bias"]),
    }
    want = {"w": wd_base, "b": wd_bias,
            "norm.scale": wd_norm, "norm.bias": wd_norm,
            "rb.w1": wd_base, "rb.n1.scale": wd_norm, "rb.n1.bias": wd_norm}
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4,
                                   err_msg=f"decay group for {k}")
