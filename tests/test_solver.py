"""Solver parity tests: RMSprop/Adam trajectories vs torch.optim on identical
gradient streams; LR schedule formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
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
