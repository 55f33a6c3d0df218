"""Trainer tests: loss decreases on a tiny VQ-VAE, gradient-accumulation
semantics match the reference (summed grads, step every A), resume restores
the iteration counter, NaN guard fires."""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvt_tpu.config import get_cfg
from lvt_tpu.engine import Trainer
from lvt_tpu.engine.hooks import PeriodicCheckpointer
from lvt_tpu.parallel.mesh import build_mesh

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _cfg(tmp_path, accum=1):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"  # oracle tests compare fp32 math
    cfg.MODEL.ENCODER.NF = 16
    cfg.MODEL.ENCODER.RES_CHANNELS = 8
    cfg.MODEL.ENCODER.N_LAYERS = 1
    cfg.MODEL.GENERATOR.NF = 16
    cfg.MODEL.GENERATOR.RES_CHANNELS = 8
    cfg.MODEL.GENERATOR.N_LAYERS = 1
    cfg.MODEL.GENERATOR.IN_CHANNELS = 16
    cfg.MODEL.CODEBOOK.DIM = 16
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.LR_G = 1e-3
    cfg.SOLVER.ACCUMULATION_STEPS = accum
    cfg.SOLVER.MAX_ITER = 30
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.SEED = 1
    return cfg


def _synthetic_loader(rng, batch, n=64):
    data = rng.random((n, 16, 16, 3)).astype(np.float32)

    class L:
        def __iter__(self):
            idx_stream = itertools.cycle(range(0, n - batch, batch))
            for s in idx_stream:
                yield {"image": data[s : s + batch]}

    return L()


def test_training_reduces_loss(rng, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg, _synthetic_loader(rng, 8), mesh=build_mesh(data=4))
    trainer.train(0, 30)
    hist = trainer.storage.history("loss_reconstruction").values()
    first, last = hist[0][0], hist[-1][0]
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_gradient_accumulation_matches_reference_semantics(rng, tmp_path):
    """A steps with accumulation A == applying the summed gradient once
    (reference trainer.py:78-87 backward-accumulates then steps)."""
    cfg1 = _cfg(tmp_path, accum=1)
    cfg2 = _cfg(tmp_path, accum=2)

    # identical data stream for both runs
    def loader():
        r = np.random.default_rng(3)
        return _synthetic_loader(r, 8)

    mesh = build_mesh(data=1, model=1, devices=jax.devices()[:1])
    t2 = Trainer(cfg2, loader(), mesh=mesh)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), t2.state.params)
    t2.train(0, 2)  # one optimizer step worth (2 accumulation microsteps)
    p2 = jax.tree_util.tree_map(lambda x: np.asarray(x), t2.state.params)

    # manual: sum grads of the same two batches, single optimizer step
    import optax

    from lvt_tpu.solver import build_optimizer

    model = t2.model
    params = jax.tree_util.tree_map(jnp.asarray, p0)
    mstate = t2.model
    # rebuild initial state identically
    t_ref = Trainer(cfg1, loader(), mesh=mesh)
    params = t_ref.state.params
    mstate = t_ref.state.model_state
    batches = list(itertools.islice(iter(loader()), 2))
    key = jax.device_put(jax.random.key(cfg1.SEED + 1))

    def loss_and_state(p, ms, b, rng):
        loss, (_, new_ms) = model.train_loss(p, ms, b, rng)
        return loss, new_ms

    grad_fn = jax.grad(loss_and_state, has_aux=True)
    # microstep 0 advances the EMA codebook state (in-forward EMA update,
    # reference vq_embedding.py:40-59), so microstep 1's gradient sees it
    g0, ms1 = grad_fn(params, mstate,
                      jax.tree_util.tree_map(jnp.asarray, batches[0]),
                      jax.random.fold_in(key, 0))
    g1, _ = grad_fn(params, ms1,
                    jax.tree_util.tree_map(jnp.asarray, batches[1]),
                    jax.random.fold_in(key, 1))
    gsum = jax.tree_util.tree_map(jnp.add, g0, g1)
    opt = build_optimizer(cfg1)
    ost = opt.init(params)
    upd, _ = opt.update(gsum, ost, params)
    want = optax.apply_updates(params, upd)

    flat_got = jax.tree_util.tree_leaves(p2)
    flat_want = [np.asarray(x) for x in jax.tree_util.tree_leaves(want)]
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_checkpoint_resume_restores_iteration(rng, tmp_path):
    cfg = _cfg(tmp_path)
    mesh = build_mesh(data=2, model=1, devices=jax.devices()[:2])
    trainer = Trainer(cfg, _synthetic_loader(rng, 8), mesh=mesh)
    trainer.register_hooks([PeriodicCheckpointer(cfg.OUTPUT_DIR, period=10)])
    trainer.train(0, 10)

    trainer2 = Trainer(cfg, _synthetic_loader(rng, 8), mesh=mesh)
    start = trainer2.resume_or_load()
    assert start == 10
    # params actually restored
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_bf16_mixed_precision_training(rng, tmp_path):
    """bf16 compute with fp32 master params: loss decreases, params stay fp32."""
    cfg = _cfg(tmp_path)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    trainer = Trainer(cfg, _synthetic_loader(rng, 8), mesh=build_mesh(data=4))
    trainer.train(0, 25)
    hist = trainer.storage.history("loss_reconstruction").values()
    assert hist[-1][0] < hist[0][0]
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.dtype == jnp.float32


def test_nan_guard(rng, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg, _synthetic_loader(rng, 8), mesh=build_mesh(data=4))
    trainer.metrics_period = 1

    bad = {"image": np.full((8, 16, 16, 3), np.nan, np.float32)}

    class BadLoader:
        def __iter__(self):
            while True:
                yield bad

    trainer._data_loader_iter = iter(BadLoader())
    with pytest.raises(FloatingPointError):
        trainer.train(0, 2)


def test_class_conditional_vt_trains(rng, tmp_path):
    """Kinetics-style class-conditional VT (KDSFVT path): the class ids ride
    the batch through _put_batch into the jitted step, and training moves
    the loss."""
    from lvt_tpu.models.vt import VideoTransformer

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 2, 8
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.CLASS_NUM = 6
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.OPTIMIZER_NAME = "rmsprop"
    cfg.SOLVER.RMSPROP.ALPHA_G = 0.95
    cfg.SOLVER.RMSPROP.MOMENTUM_G = 0.9
    cfg.SOLVER.LR_G = 1e-3
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.VIS_PERIOD = 0

    data = np.random.default_rng(0)
    fixed = {"video": data.integers(0, 8, size=(8, 2, 4, 4, 4)).astype(np.int32),
             "class": data.integers(0, 6, size=(8,)).astype(np.int32)}

    class L:
        def __iter__(self):
            while True:
                yield fixed

    model = VideoTransformer(cfg, T=4, H=4, W=4)
    assert "class_embedding" in model.init(jax.random.key(0))[0]["netG"]["encoder"]
    trainer = Trainer(cfg, L(), model=model, mesh=build_mesh(data=4))
    trainer.train(0, 12)
    hist = trainer.storage.history("loss_cross_entropy").values()
    first, last = hist[0][0], hist[-1][0]
    assert np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_put_batch_int16_transport_is_exact(rng, tmp_path):
    """Code/class fields whose config-bounded vocabulary fits int16 cross
    the host->device link narrowed and come back as bit-identical int32
    (transport-byte halving, decisive on slow links); image floats and
    configs with NV >= 2^15 are untouched."""
    from lvt_tpu.models.vt import VideoTransformer

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "VideoTransformerModel"
    v = cfg.MODEL.AUTOREGRESSIVE.VT
    v.NC, v.NV = 2, 8
    v.KERNEL, v.STRIDE = (3, 1, 1), (4, 1, 1)
    v.D, v.DA, v.DE = 32, 16, 16
    v.BLOCKS_E = ((1, 4, 4),) * 2
    v.N_HEAD_E = (2, 2)
    v.BLOCKS_D = ((1, 4, 4),) * 2
    v.N_HEAD_D = (2, 2)
    v.N_PRIME = 1
    v.CLASS_NUM = 6
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.OUTPUT_DIR = str(tmp_path)

    video = rng.integers(0, 8, size=(8, 2, 4, 4, 4)).astype(np.int32)
    cls = rng.integers(0, 6, size=(8,)).astype(np.int32)
    batch = {"video": video, "class": cls,
             "image": rng.random((8, 4, 4, 3)).astype(np.float32)}

    class L:
        def __iter__(self):
            while True:
                yield dict(batch)

    model = VideoTransformer(cfg, T=4, H=4, W=4)
    trainer = Trainer(cfg, L(), model=model, mesh=build_mesh(data=4))
    placed = trainer._put_batch(dict(batch))
    assert trainer._narrow_i16 == {"video", "class"}
    assert placed["video"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(placed["video"]), video)
    np.testing.assert_array_equal(np.asarray(placed["class"]), cls)
    assert placed["image"].dtype == jnp.float32

    # vocabulary too wide for int16 -> narrowing must stay off
    cfg2 = cfg.clone()
    cfg2.MODEL.AUTOREGRESSIVE.VT.NV = 2 ** 15
    trainer2 = Trainer(cfg2, L(), model=VideoTransformer(cfg2, T=4, H=4, W=4),
                       mesh=build_mesh(data=4))
    trainer2._put_batch(dict(batch))
    assert trainer2._narrow_i16 == {"class"}

    # out-of-config-bound codes must fail LOUDLY before narrowing (ADVICE
    # r4: astype(int16) would silently wrap values from e.g. a
    # larger-codebook VQ-VAE paired with a mismatched VT config)
    trainer3 = Trainer(cfg, L(), model=model, mesh=build_mesh(data=4))
    bad = dict(batch)
    bad["video"] = np.full_like(video, 9)  # >= NV=8
    with pytest.raises(ValueError, match="mismatched dataset/config"):
        trainer3._put_batch(bad)


def test_lr_schedule_counts_iterations_under_accumulation(tmp_path):
    """optax's schedule count increments per optimizer.update (= once every
    A iterations under accumulation); WARMUP_ITERS/STEPS are
    iteration-denominated, so build_optimizer rescales the count. A
    milestone at iteration 4 with A=4 must fire at the SECOND update."""
    import optax

    from lvt_tpu.solver import build_optimizer

    cfg = _cfg(tmp_path, accum=4)
    cfg.SOLVER.OPTIMIZER_NAME = "adam"
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    cfg.SOLVER.STEPS = (4,)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0

    tx = build_optimizer(cfg, suffix="_G")
    params = {"w": jnp.zeros((4,))}
    grads = {"w": jnp.ones((4,))}
    state = tx.init(params)
    up1, state = tx.update(grads, state, params)   # update 0 -> iteration 0
    up2, state = tx.update(grads, state, params)   # update 1 -> iteration 4
    # adam normalizes constant grads to ~1, so the update magnitude tracks
    # the applied lr: the milestone must decay the second update by GAMMA
    ratio = float(jnp.abs(up2["w"][0]) / jnp.abs(up1["w"][0]))
    assert abs(ratio - cfg.SOLVER.GAMMA) < 0.02, ratio


def test_resume_restores_partial_accumulation_window(rng, tmp_path):
    """Checkpoint written mid-accumulation-window (period not a multiple of
    A) must carry the partial gradient sum; a resume that zeroed it would
    silently halve the next update's effective gradient."""
    from lvt_tpu.checkpoint import save_checkpoint

    cfg = _cfg(tmp_path, accum=2)
    mesh = build_mesh(data=1, model=1, devices=jax.devices()[:1])
    t = Trainer(cfg, _synthetic_loader(rng, 8), mesh=mesh)
    t.train(0, 1)  # one microstep: accum_grads now holds a partial sum
    acc = jax.tree_util.tree_leaves(t.state.accum_grads)
    assert any(float(jnp.abs(a).max()) > 0 for a in acc)

    tree = t.checkpoint_tree()
    assert "accum_grads" in tree
    save_checkpoint(cfg.OUTPUT_DIR, 1, tree)

    t2 = Trainer(cfg, _synthetic_loader(rng, 8), mesh=mesh)
    start = t2.resume_or_load()
    assert start == 1
    for a, b in zip(jax.tree_util.tree_leaves(t.state.accum_grads),
                    jax.tree_util.tree_leaves(t2.state.accum_grads)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
