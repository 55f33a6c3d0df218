"""EvalHook integration: TEST.EVAL_PERIOD triggers run_test during training
and lands eval metrics in EventStorage (reference hooks.py:297-351 +
defaults.py:225-231)."""

import os

import numpy as np
from PIL import Image

from lvt_tpu.config import get_cfg
from lvt_tpu.data.build import build_train_loader
from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvt_tpu.engine import EvalHook, Trainer
from lvt_tpu.engine.defaults import run_test
from lvt_tpu.parallel.mesh import build_mesh
from lvt_tpu.utils.image import get_video_paths

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_eval_hook_runs_during_training(tmp_path):
    root = str(tmp_path / "vids")
    rng = np.random.default_rng(0)
    for v in range(2):
        d = os.path.join(root, f"video_{v}")
        os.makedirs(d)
        for f in range(4):
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
                os.path.join(d, f"{f}.png"))

    name = "evalhook_toy"
    if name in DatasetCatalog.list():
        DatasetCatalog._REGISTERED.pop(name)
    DatasetCatalog.register(name, lambda: get_video_paths(root, use_cache=False))
    MetadataCatalog.get(name).set(root=root)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_DIR, "vqvae", "PR-DVQVAE2.yaml"))
    cfg.MODEL.ENCODER.NF = 16
    cfg.MODEL.ENCODER.RES_CHANNELS = 8
    cfg.MODEL.ENCODER.N_LAYERS = 1
    cfg.MODEL.GENERATOR.NF = 16
    cfg.MODEL.GENERATOR.RES_CHANNELS = 8
    cfg.MODEL.GENERATOR.N_LAYERS = 1
    cfg.MODEL.GENERATOR.IN_CHANNELS = 16
    cfg.MODEL.CODEBOOK.DIM = 16
    cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN = 2
    cfg.INPUT.N_FRAMES_PER_VIDEO_TEST = 4
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.TEST.EVALUATORS = "MSEEvaluator"
    cfg.TEST.EVAL_PERIOD = 3
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    loader, _ = build_train_loader(cfg)
    trainer = Trainer(cfg, loader, mesh=build_mesh(data=4))

    calls = []

    def eval_fn():
        r = run_test(cfg, trainer.model, trainer.state.params,
                     trainer.state.model_state)
        calls.append(r)
        return r

    trainer.register_hooks([EvalHook(cfg.TEST.EVAL_PERIOD, eval_fn)])
    trainer.train(0, 7)

    # period 3 over 7 iters: after iters 3 and 6, plus the final one
    assert len(calls) == 3
    assert all(np.isfinite(c["reconstruction"]["MSE"]) for c in calls)
    # metrics landed in storage under eval/
    assert "eval/reconstruction/MSE" in trainer.storage.histories()

    # the 3 evals shared ONE traced/compiled infer fn (the ~10-min TPU
    # sampling compile must be paid once per run, not per EVAL_PERIOD)
    from lvt_tpu.engine.defaults import trace_counts
    traces = trace_counts(trainer.model)
    assert traces, "no trace counts recorded"
    assert all(v == 1 for v in traces.values()), traces


def test_cached_jit_builds_once_per_model_and_key():
    import jax.numpy as jnp

    from lvt_tpu.engine.defaults import _cached_jit, trace_counts

    class M:
        pass

    m = M()
    f1 = _cached_jit(m, ("k",), lambda x: x + 1)
    f2 = _cached_jit(m, ("k",), lambda x: x + 1)
    assert f1 is f2
    np.testing.assert_allclose(f1(jnp.ones(3)), 2.0)
    np.testing.assert_allclose(f2(jnp.ones(3)), 2.0)
    assert trace_counts(m)[("k",)] == 1
    # different key -> different jit
    f3 = _cached_jit(m, ("other",), lambda x: x * 3)
    assert f3 is not f1
