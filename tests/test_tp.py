"""Tensor parallelism as a Trainer capability (no reference counterpart —
the reference is pure DDP, vidgen/engine/launch.py).

The load-bearing check: one full train step (forward, backward, RMSprop
update) on a (data=4, model=2) mesh must match the same step computed
replicated on (data=8, model=1) — same losses, same updated parameters —
while the big matrices really are split across the model axis.
"""

import itertools

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lvt_tpu.config import get_cfg
from lvt_tpu.engine import Trainer
from lvt_tpu.models.vt import VideoTransformer
from lvt_tpu.parallel.mesh import build_mesh
from lvt_tpu.parallel.sharding import sharded_field_names, tp_spec

T, H, W = 8, 4, 4
BATCH = 8


def _vt_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    cfg.MODEL.AUTOREGRESSIVE.NAME = "VideoTransformer"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 4, 64
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 64, 32, 32
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.SHARE_P = False
    cfg.INPUT.SCALE_TO_ZEROONE = False
    cfg.SOLVER.IMS_PER_BATCH = BATCH
    cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
    cfg.SOLVER.RMSPROP.ALPHA_G = 0.95
    cfg.SOLVER.RMSPROP.MOMENTUM_G = 0.9
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SEED = 3
    return cfg


def _batches(n_steps):
    r = np.random.default_rng(7)
    return [
        {"video": r.integers(0, 64, size=(BATCH, 4, T, H, W)).astype(np.int32)}
        for _ in range(n_steps)
    ]


class _Loader:
    def __iter__(self):
        return iter(itertools.cycle(_batches(2)))


def _run(mesh, n_steps=2):
    cfg = _vt_cfg()
    model = VideoTransformer(cfg, T=T, H=H, W=W)
    tr = Trainer(cfg, _Loader(), model=model, mesh=mesh)
    losses = []
    for batch in _batches(n_steps):
        placed = tr._put_batch(batch)
        tr.state, metrics = tr._train_step(tr.state, placed, tr._step_key)
        losses.append(float(metrics["loss_cross_entropy"]))
    params = jax.tree_util.tree_map(np.asarray, tr.state.params)
    return tr, losses, params


@pytest.mark.slow  # the driver's dryrun_multichip re-proves this every round
def test_tp_step_matches_replicated():
    _, losses_rep, params_rep = _run(build_mesh(data=8, model=1))
    tr, losses_tp, params_tp = _run(build_mesh(data=4, model=2))

    np.testing.assert_allclose(losses_rep, losses_tp, rtol=1e-4)

    flat_rep = jax.tree_util.tree_leaves_with_path(params_rep)
    flat_tp = jax.tree_util.tree_leaves(params_tp)
    assert len(flat_rep) == len(flat_tp)
    for (path, a), b in zip(flat_rep, flat_tp):
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=5e-5,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_tp_actually_shards():
    tr, _, _ = _run(build_mesh(data=4, model=2), n_steps=1)
    p = tr.state.params

    wq = p["netG"]["encoder"]["layers"][0].wq
    assert wq.sharding.spec == P("model"), wq.sharding
    ffn_w1 = p["netG"]["decoder"]["layers"][0].ffn_w1
    assert ffn_w1.sharding.spec == P(None, "model"), ffn_w1.sharding

    fields = sharded_field_names(tr.mesh, p)
    assert {"wq", "wk", "wv", "proj", "ffn_w1", "ffn_w2",
            "dt_bank", "dh_bank", "dw_bank",
            "ch_embed", "ctx_table", "U_w", "P_w"} <= fields

    # the optimizer state (params-shaped RMSprop v/buf) is sharded too
    opt_fields = sharded_field_names(tr.mesh, tr.state.opt_state)
    assert "wq" in opt_fields and "ffn_w1" in opt_fields


def test_indivisible_dims_fall_back_to_replication():
    mesh = build_mesh(data=4, model=2)

    class FakeKey:
        def __init__(self, key):
            self.key = key

    # na=3 not divisible by model=2 -> replicated, not an error
    leaf = np.zeros((3, 8, 4))
    assert tp_spec(mesh, (FakeKey("wq"),), leaf) == P()
    # rank mismatch -> replicated
    leaf = np.zeros((4, 8))
    assert tp_spec(mesh, (FakeKey("wq"),), leaf) == P()
    # trivial model axis -> replicated
    mesh1 = build_mesh(data=8, model=1)
    leaf = np.zeros((4, 8, 4))
    assert tp_spec(mesh1, (FakeKey("wq"),), leaf) == P()


def test_codebook_shards_over_codes():
    from lvt_tpu.ops.vq import init_codebook

    mesh = build_mesh(data=4, model=2)
    state = init_codebook(jax.random.key(0), num=2, K=64, D=16)
    fields = sharded_field_names(mesh, state)
    assert {"embedding", "running_sum", "running_size"} <= fields


def test_spatial_parallel_vqvae_matches_replicated(tmp_path):
    """SP (TPU.SHARD_SPATIAL): image rows sharded over the model axis — the
    conv stage's halo exchanges are XLA's job; the train step must match the
    replicated run."""
    import os

    from lvt_tpu.engine import Trainer

    CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

    def _cfg(shard_spatial):
        from lvt_tpu.config import get_cfg as gc

        cfg = gc()
        cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.SHARD_SPATIAL = shard_spatial
        cfg.MODEL.ENCODER.NF = 16
        cfg.MODEL.ENCODER.RES_CHANNELS = 8
        cfg.MODEL.ENCODER.N_LAYERS = 1
        cfg.MODEL.GENERATOR.NF = 16
        cfg.MODEL.GENERATOR.RES_CHANNELS = 8
        cfg.MODEL.GENERATOR.N_LAYERS = 1
        cfg.MODEL.GENERATOR.IN_CHANNELS = 16
        cfg.MODEL.CODEBOOK.DIM = 16
        cfg.SOLVER.IMS_PER_BATCH = 8
        cfg.SEED = 2
        cfg.OUTPUT_DIR = str(tmp_path)
        return cfg

    r = np.random.default_rng(4)
    images = [r.random((8, 16, 16, 3)).astype(np.float32) for _ in range(2)]

    class L:
        def __iter__(self):
            return iter(itertools.cycle([{"image": im} for im in images]))

    def run(shard_spatial, mesh):
        tr = Trainer(_cfg(shard_spatial), L(), mesh=mesh)
        for im in images:
            placed = tr._put_batch({"image": im})
            tr.state, metrics = tr._train_step(tr.state, placed, tr._step_key)
        loss = float(metrics["loss_reconstruction"])
        return loss, jax.tree_util.tree_map(np.asarray, tr.state.params)

    loss_rep, p_rep = run(False, build_mesh(data=8, model=1))
    loss_sp, p_sp = run(True, build_mesh(data=4, model=2))
    np.testing.assert_allclose(loss_rep, loss_sp, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_rep), jax.tree_util.tree_leaves(p_sp)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=5e-5)
