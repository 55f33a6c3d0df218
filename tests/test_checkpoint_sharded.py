"""Checkpointing under GSPMD (VERDICT r4 #3): TP-sharded train state must
save and restore with its shardings intact, resume must work onto a
DIFFERENT mesh topology than the one the checkpoint was saved under, and
the restore must be warning-free (Orbax's "unsafe when restoring on a
different topology" path is avoided by passing explicit restore shardings —
checkpoint/orbax_io._restore_args_for).

Reference anchor: per-submodule fvcore Checkpointer + resume
(/root/reference/vidgen/meta_arch/ae.py:231-238,
/root/reference/vidgen/engine/defaults.py:175-191) — the reference has no
sharded-state concept at all; this surface is TPU-native.
"""

import logging

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lvt_tpu.checkpoint import latest_checkpoint, save_checkpoint
from lvt_tpu.config import get_cfg
from lvt_tpu.engine import Trainer
from lvt_tpu.models.vt import VideoTransformer
from lvt_tpu.parallel.mesh import build_mesh

T, H, W = 8, 4, 4
BATCH = 8


def _vt_cfg(tmp_path):
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
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def _batches(n_steps):
    r = np.random.default_rng(11)
    return [
        {"video": r.integers(0, 64, size=(BATCH, 4, T, H, W)).astype(np.int32)}
        for _ in range(n_steps)
    ]


class _Loader:
    def __iter__(self):
        return iter(_batches(64))


def _make_trainer(cfg, mesh):
    model = VideoTransformer(cfg, T=T, H=H, W=W)
    return Trainer(cfg, _Loader(), model=model, mesh=mesh)


def _steps(tr, batches):
    losses = []
    for batch in batches:
        placed = tr._put_batch(batch)
        tr.state, m = tr._train_step(tr.state, placed, tr._step_key)
        losses.append(float(m["loss_cross_entropy"]))
    return losses


def _host_params(tr):
    return jax.tree_util.tree_map(np.asarray, tr.state.params)


def test_tp_sharded_save_restore_roundtrip(tmp_path, caplog):
    """Save TP-sharded state under a {data:4, model:2} mesh; a fresh
    trainer's resume_or_load must restore the exact values AND keep the
    tensor-parallel leaf shardings — with no Orbax topology warning."""
    cfg = _vt_cfg(tmp_path)
    mesh = build_mesh(data=4, model=2)
    tr = _make_trainer(cfg, mesh)
    _steps(tr, _batches(3))
    saved = _host_params(tr)
    assert int(tr.state.step) == 3
    save_checkpoint(cfg.OUTPUT_DIR, 3, tr.checkpoint_tree())

    tr2 = _make_trainer(cfg, mesh)
    # fresh init differs from 3-steps-trained values (so the equality below
    # proves the restore actually moved data)
    wq_init = np.asarray(tr2.state.params["netG"]["encoder"]["layers"][0].wq)
    assert not np.array_equal(wq_init, saved["netG"]["encoder"]["layers"][0].wq)

    with caplog.at_level(logging.WARNING):
        start = tr2.resume_or_load()
    assert start == 3
    topo_warnings = [r.message for r in caplog.records
                     if "topology" in str(r.message).lower()
                     or "unsafe" in str(r.message).lower()]
    assert not topo_warnings, topo_warnings

    flat_a = jax.tree_util.tree_leaves_with_path(saved)
    flat_b = jax.tree_util.tree_leaves(_host_params(tr2))
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            a, b, err_msg=f"restore mismatch at {jax.tree_util.keystr(path)}")

    # TP shardings survived the round-trip
    wq = tr2.state.params["netG"]["encoder"]["layers"][0].wq
    assert wq.sharding.spec == P("model"), wq.sharding
    ffn_w1 = tr2.state.params["netG"]["decoder"]["layers"][0].ffn_w1
    assert ffn_w1.sharding.spec == P(None, "model"), ffn_w1.sharding


@pytest.mark.slow
def test_same_topology_resume_continues_bit_identically(tmp_path):
    """Kill-and-resume on the SAME mesh: the resumed run's losses must be
    BIT-identical to the unbroken run's, and its parameters bit-identical
    to a continuation whose step-3 state passed the same host->device
    placement — i.e. the restore adds NOTHING beyond placement.

    Why the donated on-device chain is not the parameter oracle: XLA:CPU
    executes ulp-different reduction variants keyed on buffer PROVENANCE —
    continuing from a donated executable-output buffer vs from a fresh
    device_put of bit-identical values produced last-ulp drift in 77
    RMSprop-v leaves with NO checkpoint involved (r5 three-arm experiment:
    donated-chain vs re-placed differ, re-placed vs orbax-restored are
    bit-equal on every leaf; all three loss trajectories bit-equal). Any
    real restore bug still fails this test: it would show up as
    restored-vs-replaced drift or a loss deviation."""
    cfg = _vt_cfg(tmp_path)
    mesh = build_mesh(data=4, model=2)
    tr = _make_trainer(cfg, mesh)
    batches = _batches(5)
    _steps(tr, batches[:3])
    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    snap_p, snap_o, snap_m = (host(tr.state.params), host(tr.state.opt_state),
                              host(tr.state.model_state))
    save_checkpoint(cfg.OUTPUT_DIR, 3, tr.checkpoint_tree())
    tail_unbroken = _steps(tr, batches[3:])

    # arm B: in-memory re-place of the step-3 state (no checkpoint)
    import jax.numpy as jnp
    trb = _make_trainer(cfg, mesh)
    trb.state = trb._place_state(trb.state._replace(
        params=snap_p, opt_state=snap_o, model_state=snap_m,
        step=jnp.asarray(3)))
    tail_replaced = _steps(trb, batches[3:])
    replaced = _host_params(trb)

    # arm C: orbax restore
    tr2 = _make_trainer(cfg, mesh)
    assert tr2.resume_or_load() == 3
    tail_resumed = _steps(tr2, batches[3:])
    assert tail_resumed == tail_unbroken, (tail_resumed, tail_unbroken)
    assert tail_resumed == tail_replaced, (tail_resumed, tail_replaced)
    flat_a = jax.tree_util.tree_leaves_with_path(replaced)
    flat_b = jax.tree_util.tree_leaves(_host_params(tr2))
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            a, b,
            err_msg=f"restore != placement at {jax.tree_util.keystr(path)}")


@pytest.mark.slow
@pytest.mark.parametrize("resume_mesh", [dict(data=8, model=1),
                                         dict(data=2, model=4)])
def test_topology_change_resume_continues_equivalently(tmp_path, resume_mesh):
    """Save on {data:4, model:2}; resume onto a different topology and
    train on: the continuation must track an unbroken same-seed run on the
    original mesh. Bit-identity is NOT physically achievable here — a
    different mesh shape changes GSPMD's gradient-reduction order, and
    RMSprop's scale-free g/sqrt(v) normalization turns last-ulp gradient
    differences on near-zero params into O(lr)=2e-5 update differences
    (measured: worst |delta| 2.0e-5 after 2 post-resume steps). The test
    bounds the divergence at a few optimizer steps' worth and requires the
    loss trajectory to match tightly."""
    cfg = _vt_cfg(tmp_path)
    mesh_a = build_mesh(data=4, model=2)
    tr = _make_trainer(cfg, mesh_a)
    batches = _batches(5)
    _steps(tr, batches[:3])
    save_checkpoint(cfg.OUTPUT_DIR, 3, tr.checkpoint_tree())
    tail_unbroken = _steps(tr, batches[3:])  # unbroken continuation
    unbroken = _host_params(tr)

    tr2 = _make_trainer(cfg, build_mesh(**resume_mesh))
    start = tr2.resume_or_load()
    assert start == 3
    assert int(tr2.state.step) == 3
    tail_resumed = _steps(tr2, batches[3:])
    resumed = _host_params(tr2)

    np.testing.assert_allclose(tail_resumed, tail_unbroken, rtol=1e-5)
    lr = cfg.SOLVER.LR_G
    flat_a = jax.tree_util.tree_leaves_with_path(unbroken)
    flat_b = jax.tree_util.tree_leaves(resumed)
    assert len(flat_a) == len(flat_b)
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=5 * lr,
            err_msg=f"post-resume divergence at {jax.tree_util.keystr(path)}")


def test_restore_places_leaves_on_current_mesh(tmp_path):
    """The restored arrays must live on the RESUMING trainer's mesh (not a
    host-replayed copy of the saved layout): every leaf's sharding mesh
    must span the new device set."""
    cfg = _vt_cfg(tmp_path)
    tr = _make_trainer(cfg, build_mesh(data=4, model=2))
    _steps(tr, _batches(1))
    save_checkpoint(cfg.OUTPUT_DIR, 1, tr.checkpoint_tree())

    mesh_b = build_mesh(data=2, model=4)
    tr2 = _make_trainer(cfg, mesh_b)
    tr2.resume_or_load()
    devset = set(mesh_b.devices.flat)
    for path, leaf in jax.tree_util.tree_leaves_with_path(tr2.state.params):
        assert set(leaf.sharding.device_set) == devset, (
            f"{jax.tree_util.keystr(path)} restored onto "
            f"{leaf.sharding.device_set}")
    # a 4-way-divisible field is genuinely TP-sharded on the new mesh
    ffn_w1 = tr2.state.params["netG"]["decoder"]["layers"][0].ffn_w1
    assert ffn_w1.sharding.spec == P(None, "model"), ffn_w1.sharding
    assert latest_checkpoint(cfg.OUTPUT_DIR).endswith("ckpt_1")
