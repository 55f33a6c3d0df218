"""k-step COMPOSED training-trajectory parity vs torch oracles (VERDICT r2
#7). Single-pass parity (test_vt_torch_parity, test_solver) can't catch
drift that accumulates through the composed loop — this runs 5 full steps of
data prep -> loss -> backward -> optimizer (and, for the VQ path, the EMA
codebook update whose pre/post-update lookup order is the subtle part,
reference vq_embedding.py:40-62) from the SAME converted init on the SAME
fixed batches, and asserts the loss/state trajectories match to fp32
tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from lvt_tpu.checkpoint.torch_convert import convert_video_transformer
from lvt_tpu.config import get_cfg
from lvt_tpu.models.vt import VideoTransformer
from lvt_tpu.ops import vq as vq_ops
from lvt_tpu.solver.build import build_optimizer

from test_vt_torch_parity import _make_torch_state, _torch_vt_logits_t

N_STEPS = 5
LR = 1e-3
ALPHA = 0.95
MOMENTUM = 0.9
WD_BASE, WD_BIAS, WD_NORM = 0.01, 0.002, 0.0
T, H, W = 8, 4, 4
BATCH = 2


def _wd_group(key: str) -> str:
    """Reference grouping (solver/build.py:13-42): params of norm modules ->
    NORM decay; params literally named 'bias' -> BIAS; rest -> BASE."""
    if "layer_norm." in key or ".ffn.0." in key:
        return "norm"
    if key.endswith(".bias"):
        return "bias"
    return "base"


def _vt_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 2, 8
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 24, 12, 12
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((2, 4, 4),)
    v.N_HEAD_D = (2,)
    v.N_PRIME = 1
    v.SHARE_P = False
    cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
    cfg.SOLVER.LR_G = LR
    cfg.SOLVER.RMSPROP.ALPHA_G = 0.95
    cfg.SOLVER.RMSPROP.MOMENTUM_G = 0.9
    cfg.SOLVER.WEIGHT_DECAY.BASE_G = WD_BASE
    cfg.SOLVER.WEIGHT_DECAY.BIAS_G = WD_BIAS
    cfg.SOLVER.WEIGHT_DECAY.NORM_G = WD_NORM
    cfg.SOLVER.LR_SCHEDULER_NAME = "Identity"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_vt_5step_trajectory_matches_torch(rng):
    """The torch trajectory drives; each step we sync our params AND
    optimizer state (v/buf, converted with the same layout maps as the
    params) from torch, then run ONE composed step on both sides and
    compare losses + updated params tightly.

    Why synced rather than free-running: RMSprop normalizes by sqrt(v), so
    on coordinates whose effective gradient is ~float-noise the update is
    sign-like — a 1e-10 gradient-noise difference (measured; the real
    agreement level vs torch autograd) becomes an O(lr) parameter
    difference, and free-running fp32 trajectories diverge chaotically by
    ~1e-3 in 5 steps with NO semantic bug. Syncing kills the amplification
    while still exercising 5 distinct points of the real trajectory through
    the full composed path."""
    cfg = _vt_cfg()
    model = VideoTransformer(cfg, T=T, H=H, W=W)
    c = model.c
    S = model.plan.num_slices
    sd = _make_torch_state(rng, c, S)

    # fixed data: one video batch + one slice-index vector per step;
    # slice 0 contains frame 0 (< n_prime) so the ignore mask is exercised
    videos = [rng.integers(0, c.nv, size=(BATCH, c.nc, T, H, W)).astype(np.int32)
              for _ in range(N_STEPS)]
    slice_indices = [np.asarray([(i % S), (i + 1) % S], np.int32)
                     for i in range(N_STEPS)]

    # ---- our composed step (on-device slice prep inside loss)
    opt = build_optimizer(cfg)
    opt_state_proto = opt.init({"netG": convert_video_transformer(sd, c)})

    @jax.jit
    def step(params, opt_state, video, si):
        def loss_fn(p):
            return model.loss(p, {"video": video}, jax.random.key(0),
                              slice_idx=si)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    # ---- torch side: autograd + torch.optim.RMSprop with reference groups
    sdt = {k: torch.tensor(v, requires_grad=True) for k, v in sd.items()}
    groups = {"base": [], "bias": [], "norm": []}
    for k, p in sdt.items():
        groups[_wd_group(k)].append(p)
    opt_t = torch.optim.RMSprop(
        [{"params": groups["base"], "weight_decay": WD_BASE},
         {"params": groups["bias"], "weight_decay": WD_BIAS},
         {"params": groups["norm"], "weight_decay": WD_NORM}],
        lr=LR, alpha=ALPHA, momentum=MOMENTUM)

    def torch_opt_state_tree(field):
        """torch per-param state ('square_avg'/'momentum_buffer') -> a
        params-shaped tree via the SAME converter the params use (pure
        permutations/reshapes, valid for elementwise optimizer state)."""
        state_sd = {}
        for k, p in sdt.items():
            s = opt_t.state.get(p, {})
            state_sd[k] = (s[field].numpy().copy() if field in s
                           else np.zeros_like(sd[k]))
        return {"netG": convert_video_transformer(state_sd, c)}

    saw_masked = saw_unmasked = False
    for i, (video, si) in enumerate(zip(videos, slice_indices)):
        # sync our params + optimizer state to the torch trajectory point
        params = {"netG": convert_video_transformer(
            {k: v.detach().numpy().copy() for k, v in sdt.items()}, c)}
        decay_state, _, sched_state = opt_state_proto
        opt_state = (decay_state,
                     type(opt_state_proto[1])(
                         v=torch_opt_state_tree("square_avg"),
                         buf=torch_opt_state_tree("momentum_buffer")),
                     sched_state._replace(count=jnp.asarray(i)))

        new_params, _, loss_j = step(params, opt_state,
                                     jnp.asarray(video), jnp.asarray(si))

        # identical integer slice prep (covered by subscale tests) feeds both
        ctx, sl, ignore = model.prepare_slices(jnp.asarray(video),
                                               jnp.asarray(si))
        ctx, sl = np.asarray(ctx), np.asarray(sl)
        ignore = np.asarray(ignore)
        saw_masked |= bool(ignore.any())
        saw_unmasked |= bool(~ignore.all())

        logits = _torch_vt_logits_t(sdt, c, ctx, sl, torch.from_numpy(si))
        tgt = torch.from_numpy(sl).long().permute(0, 2, 3, 4, 1)
        lse = torch.logsumexp(logits, dim=-1)
        true = torch.gather(logits, -1, tgt.unsqueeze(-1)).squeeze(-1)
        ce = lse - true
        valid = torch.from_numpy(~ignore).float().unsqueeze(-1).expand_as(ce)
        num = (ce * valid).sum(dim=(0, 1, 2, 3))
        den = valid.sum(dim=(0, 1, 2, 3)).clamp(min=1.0)
        loss_t = (num / den).mean()

        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()

        # losses at the synced point: forward-only fp32 noise
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                                   rtol=2e-6, err_msg=f"loss at step {i}")
        # one composed step (decay groups + RMSprop recurrence + lr) lands
        # on the same updated params. atol: on a coordinate where
        # g + wd*p cancels to ~float noise the RMSprop update is sign-like
        # (g/(sqrt(v)+eps) with v~0) and disagrees by O(lr) harmlessly —
        # observed 1 element in 1e5 at ~1e-5. The decay-group bug this test
        # caught (norm params misrouted to base decay) showed as 8.9e-3 on
        # ~half the elements of every ln_scale — 400x the tolerance.
        params_t = {"netG": convert_video_transformer(
            {k: v.detach().numpy().copy() for k, v in sdt.items()}, c)}
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(new_params),
                jax.tree_util.tree_leaves(params_t)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5,
                err_msg=f"step {i} param at {jax.tree_util.keystr(path)}")

    assert saw_masked and saw_unmasked, \
        "fixture must exercise both masked and unmasked positions"


# --------------------------------------------------------------------------
# EMA VQ codebook trajectory (reference vq_embedding.py:40-62 order)
# --------------------------------------------------------------------------

def _np_ema_oracle(z_batches, emb0, decay=0.99, eps=1e-5):
    """The reference's EMA recurrence in plain numpy, k steps: nearest by
    ||c||^2 + ||x||^2 - 2xc with low-index tie-break (torch.min), EMA of
    (size, sum), normalized-Laplace embedding rewrite, and the POST-update
    lookup for z_q_bar."""
    K, Dc = emb0.shape
    emb = emb0.copy()
    running_size = np.zeros(K, np.float64)
    running_sum = emb0.astype(np.float64).copy()
    idx_hist, emb_hist, zq_hist = [], [], []
    for z in z_batches:  # (N, Dc)
        d = (emb ** 2).sum(1)[None, :] + (z ** 2).sum(1)[:, None] \
            - 2.0 * z @ emb.T
        idx = d.argmin(axis=1)  # numpy argmin breaks ties low, like torch.min
        size = np.bincount(idx, minlength=K).astype(np.float64)
        vec_sum = np.zeros((K, Dc), np.float64)
        np.add.at(vec_sum, idx, z)
        running_size = running_size * decay + (1 - decay) * size
        running_sum = running_sum * decay + (1 - decay) * vec_sum
        n = running_size.sum()
        denom = (running_size + eps) / (n + K * eps) * n
        emb = (running_sum / denom[:, None]).astype(np.float64)
        idx_hist.append(idx)
        emb_hist.append(emb.copy())
        zq_hist.append(emb[idx])  # post-update lookup (reference :61-62)
    return idx_hist, emb_hist, zq_hist


def test_vq_ema_5step_trajectory_matches_reference_equations(rng):
    K, Dc = 16, 8
    state = vq_ops.init_codebook(jax.random.key(1), num=1, K=K, D=Dc)
    emb0 = np.asarray(state.embedding[0], np.float64)

    z_batches = [rng.standard_normal((64, Dc)).astype(np.float32) * 0.5
                 for _ in range(N_STEPS)]
    idx_o, emb_o, zq_o = _np_ema_oracle([z.astype(np.float64)
                                         for z in z_batches], emb0)

    for step_i, z in enumerate(z_batches):
        z_q_st, z_q, indices, state = vq_ops.quantize_st(
            jnp.asarray(z), state, ema=True, train=True, use_pallas=False)
        np.testing.assert_array_equal(
            np.asarray(indices[:, 0]), idx_o[step_i],
            err_msg=f"indices diverged at step {step_i}")
        np.testing.assert_allclose(
            np.asarray(state.embedding[0]), emb_o[step_i], rtol=1e-5,
            atol=1e-6, err_msg=f"EMA embedding diverged at step {step_i}")
        # the differentiable z_q must be the POST-update lookup
        np.testing.assert_allclose(
            np.asarray(z_q), zq_o[step_i], rtol=1e-5, atol=1e-6,
            err_msg=f"post-update lookup order broken at step {step_i}")
        # and the straight-through value the PRE-update one
        pre_emb = emb0 if step_i == 0 else emb_o[step_i - 1]
        np.testing.assert_allclose(
            np.asarray(z_q_st), pre_emb[idx_o[step_i]], rtol=1e-5, atol=1e-6,
            err_msg=f"pre-update straight-through broken at step {step_i}")
