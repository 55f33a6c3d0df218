"""Default CLI plumbing, setup, inference adapters, and the DefaultTrainer
(reference: vidgen/engine/defaults.py:37-363).

The inference adapters wrap each meta-arch's jitted passes into the
``infer_fn(batch) -> list[dict]`` protocol consumed by
evaluation.inference_on_dataset, replacing the reference's
``model(inputs, mode='inference')`` polymorphic forward.
"""

import argparse
import logging
import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import set_global_cfg
from ..data import build_test_loader, build_train_loader
from ..evaluation import (
    BitsEvaluator,
    CodesExtractor,
    DatasetEvaluators,
    FVDEvaluator,
    MSEEvaluator,
    VTSampler,
    inference_on_dataset,
    print_csv_format,
    verify_results,
)
from ..utils import comm
from ..utils.env import seed_all_rng
from ..utils.events import CommonMetricPrinter, JSONWriter, TensorboardWriter
from ..utils.logger import setup_logger
from .hooks import EvalHook, IterationTimer, LRSchedulerHook, PeriodicCheckpointer, PeriodicWriter
from .trainer import Trainer

logger = logging.getLogger(__name__)

EVALUATOR_REGISTRY = {
    "MSEEvaluator": MSEEvaluator,
    "BitsEvaluator": BitsEvaluator,
    "CodesExtractor": CodesExtractor,
    "VTSampler": VTSampler,
    "FVDEvaluator": FVDEvaluator,
}


def default_argument_parser():
    """reference defaults.py:37-69 minus the GPU/dist-url machinery (JAX is
    single-controller; multi-host init is via --multihost)."""
    parser = argparse.ArgumentParser(description="lvt_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE",
                        help="path to config file")
    parser.add_argument("--resume", action="store_true",
                        help="resume from OUTPUT_DIR checkpoints")
    parser.add_argument("--eval-only", action="store_true", help="evaluate only")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for multi-host")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="config overrides: KEY VALUE pairs")
    return parser


def default_setup(cfg, args):
    """Logging, seeding, config dump (reference defaults.py:72-121)."""
    output_dir = cfg.OUTPUT_DIR
    if comm.is_main_process() and output_dir:
        os.makedirs(output_dir, exist_ok=True)

    rank = comm.get_rank()
    setup_logger(output_dir, distributed_rank=rank, name="lvt_tpu")
    from ..utils.collect_env import collect_env_info

    logging.getLogger("lvt_tpu").info(
        f"Rank of current process: {rank}. World size: {comm.get_world_size()}")
    logging.getLogger("lvt_tpu").info("Environment info:\n" + collect_env_info())
    logging.getLogger("lvt_tpu").info(
        f"jax {jax.__version__}, backend {jax.default_backend()}, "
        f"{jax.device_count()} devices")
    if hasattr(args, "config_file") and args.config_file:
        logging.getLogger("lvt_tpu").info(f"Loaded config file {args.config_file}")

    if comm.is_main_process() and output_dir:
        path = os.path.join(output_dir, "config.yaml")
        with open(path, "w") as f:
            f.write(cfg.dump())
        logging.getLogger("lvt_tpu").info(f"Full config saved to {path}")

    seed = cfg.SEED
    seed_all_rng(None if seed < 0 else seed + rank)
    set_global_cfg(cfg)


# --------------------------------------------------------------------------
# Inference adapters
# --------------------------------------------------------------------------

# Jits are built ONCE per (model, task) and reused across every run_test /
# EvalHook invocation — params flow in as arguments, never closed over, so
# periodic eval re-pays zero trace/compile time (the VT sampling scan takes
# ~10 min to compile on TPU). The cache AND the trace counts live ON the
# model object itself: their lifetime equals the model's (a module-global
# id()-keyed dict would alias across model lifetimes after GC reuses an
# address, and would never shrink).


def trace_counts(model) -> dict:
    """{key: number of actual traces} for this model's cached jits (tests)."""
    return getattr(model, "_lvt_trace_counts", {})


def _cached_jit(model, key, fn):
    """jit ``fn`` once per (model instance, key); counts real traces."""
    cache = getattr(model, "_lvt_jit_cache", None)
    if cache is None:
        cache = {}
        model._lvt_jit_cache = cache
        model._lvt_trace_counts = {}
    if key not in cache:
        counts = model._lvt_trace_counts

        def counted(*args, **kwargs):
            counts[key] = counts.get(key, 0) + 1
            return fn(*args, **kwargs)

        cache[key] = jax.jit(counted)
    return cache[key]


def build_vqvae_infer_fn(cfg, model, params, state):
    """Per-video reconstruction + latent extraction (reference
    AutoEncoderModel.forward mode='inference', ae.py:120-147)."""
    clamp_hi = 1.0 if cfg.INPUT.SCALE_TO_ZEROONE else 255.0

    def run(params, state, frames):  # (T, H, W, C)
        x = model.normalize(frames)
        recon, idx = model.reconstruct(params, state, x)
        recon = jnp.clip(model.denormalize(recon), 0.0, clamp_hi)
        return recon, idx

    run_jit = _cached_jit(model, ("vqvae_infer", clamp_hi), run)

    def infer(batch):
        outputs = []
        key = "image_sequence" if "image_sequence" in batch else "image"
        arr = batch[key]
        for i in range(len(arr)):
            recon, idx = run_jit(params, state, jnp.asarray(arr[i]))
            outputs.append({
                "reconstruction": np.asarray(recon),
                # (T, h, w, nc) -> reference layout (T, nc, h, w)
                "latent": np.transpose(np.asarray(idx), (0, 3, 1, 2)),
            })
        return outputs

    return infer


def build_vt_infer_fn(cfg, model, params, *, rng=None):
    """Whole-video teacher-forced logits and/or sampling, dispatched on
    TEST.EVALUATORS (reference VideoTransformerModel.forward
    mode='inference', vt.py:192-206)."""
    evaluators = cfg.TEST.EVALUATORS
    want_logits = "BitsEvaluator" in evaluators
    want_samples = ("VTSampler" in evaluators) or ("FVDEvaluator" in evaluators)
    n_prime_eval = cfg.MODEL.AUTOREGRESSIVE.VT.N_PRIME
    n_prime_sample = cfg.TEST.VT_SAMPLER.N_PRIME
    num_samples = cfg.TEST.VT_SAMPLER.NUM_SAMPLES
    kv_dtype = cfg.TEST.VT_SAMPLER.KV_DTYPE
    kv_seg = cfg.TEST.VT_SAMPLER.SEG
    w_dtype = getattr(cfg.TEST.VT_SAMPLER, "WEIGHT_DTYPE", "native")
    attn_impl = getattr(cfg.TEST.VT_SAMPLER, "ATTN_IMPL", "xla")
    if rng is None:
        rng = jax.random.key(max(cfg.SEED, 0))
    rng_holder = {"key": rng}

    logits_fn = _cached_jit(
        model, ("vt_logits",),
        lambda params, v, cls: model.logits_for_entire_video(
            params, v, class_idx=cls)) if want_logits else None

    def _sample(params, v, cls, key):
        # all num_samples rollouts ride the batch dimension of ONE jitted
        # sample_video call (the reference loops sample_video num_samples
        # times, vt.py:221-223)
        vrep = jnp.concatenate([v] * num_samples, axis=0)
        crep = None if cls is None else jnp.concatenate([cls] * num_samples)
        primed = vrep.at[:, :, n_prime_sample:].set(0)
        out = model.sample_video(params, primed, key,
                                 n_prime=n_prime_sample, class_idx=crep,
                                 kv_cache_dtype=kv_dtype, kv_seg_size=kv_seg,
                                 weight_dtype=w_dtype, attn_impl=attn_impl)
        return out.reshape((num_samples,) + v.shape)

    sample_fn = _cached_jit(
        model, ("vt_sample", num_samples, n_prime_sample, kv_dtype, kv_seg,
                w_dtype, attn_impl),
        _sample) if want_samples else None

    def infer(batch):
        video = jnp.asarray(batch["video"])  # (b, nc, T, H, W)
        cls = jnp.asarray(batch["class"]) if (
            "class" in batch and model.c.class_num > 0) else None
        b, _, T = video.shape[:3]
        outputs = [{} for _ in range(b)]

        if want_logits:
            lg = np.asarray(logits_fn(params, video, cls))
            ignore_t = np.arange(T) < n_prime_eval
            for i in range(b):
                outputs[i]["logits"] = lg[i]
                outputs[i]["ignore_t"] = ignore_t
        if want_samples:
            rng_holder["key"], sub = jax.random.split(rng_holder["key"])
            samples = np.asarray(sample_fn(params, video, cls, sub))  # (S, b, ...)
            for i in range(b):
                outputs[i]["samples"] = [samples[s, i] for s in range(num_samples)]
        assert all(outputs), "No evaluator-compatible output produced"
        return outputs

    return infer


def build_evaluators(cfg, dataset_name, output_dir):
    names = [n.strip().strip("'\"") for n in cfg.TEST.EVALUATORS.split(",")
             if n.strip().strip("'\"")]
    evs = []
    for name in names:
        if name not in EVALUATOR_REGISTRY:
            raise KeyError(
                f"Unknown evaluator {name!r}; available: "
                f"{sorted(EVALUATOR_REGISTRY)}")
        cls = EVALUATOR_REGISTRY[name]
        if name in ("VTSampler", "FVDEvaluator"):
            evs.append(cls(cfg, dataset_name, distributed=True, output_dir=output_dir))
        else:
            evs.append(cls(dataset_name, distributed=True, output_dir=output_dir))
    return DatasetEvaluators(evs)


def run_test(cfg, model, params, state=None):
    """Loop DATASETS.TEST (reference DefaultTrainer.test,
    defaults.py:312-363)."""
    from ..models.vqvae import VQVAE, AutoEncoder
    from ..models.vt import VideoTransformer

    results = OrderedDict()
    for dataset_name in cfg.DATASETS.TEST:
        loader = build_test_loader(cfg, dataset_name)
        out_dir = os.path.join(cfg.OUTPUT_DIR, "inference")
        evaluator = build_evaluators(cfg, dataset_name, out_dir)
        if isinstance(model, (VQVAE, AutoEncoder)):
            infer_fn = build_vqvae_infer_fn(cfg, model, params, state)
        elif isinstance(model, VideoTransformer):
            infer_fn = build_vt_infer_fn(cfg, model, params)
        else:
            raise TypeError(f"Cannot infer with {type(model)}")
        r = inference_on_dataset(infer_fn, loader, evaluator)
        results[dataset_name] = r
        if comm.is_main_process() and r:
            logger.info(f"Evaluation results for {dataset_name}:")
            print_csv_format(r)
    if len(results) == 1:
        results = list(results.values())[0]
    return results


# --------------------------------------------------------------------------
# DefaultTrainer
# --------------------------------------------------------------------------

class DefaultTrainer(Trainer):
    """Trainer + default hooks/writers wiring (reference defaults.py:124-310)."""

    def __init__(self, cfg, mesh=None):
        loader, _ = build_train_loader(cfg)
        super().__init__(cfg, loader, mesh=mesh)
        self.register_hooks(self.build_hooks())

    def build_writers(self):
        out = self.cfg.OUTPUT_DIR
        writers = [CommonMetricPrinter(self.cfg.SOLVER.MAX_ITER)]
        if comm.is_main_process():
            writers.append(JSONWriter(os.path.join(out, "metrics.json")))
            try:
                writers.append(TensorboardWriter(out))
            except ImportError:
                pass
        return writers

    def build_hooks(self):
        from ..solver.build import build_lr_schedule

        cfg = self.cfg
        hooks = [
            IterationTimer(),
            LRSchedulerHook(cfg.SOLVER.LR_G, build_lr_schedule(cfg)),
        ]
        # every rank: Orbax save of mesh-sharded arrays is a collective
        # (rank-0-only would deadlock/fail under multihost TP); the hook
        # itself gates host-side pruning on rank 0
        hooks.append(PeriodicCheckpointer(cfg.OUTPUT_DIR,
                                          cfg.SOLVER.CHECKPOINT_PERIOD))
        if cfg.TEST.EVAL_PERIOD > 0:
            def eval_fn():
                return run_test(cfg, self.model, self.state.params,
                                self.state.model_state)

            hooks.append(EvalHook(cfg.TEST.EVAL_PERIOD, eval_fn))
        if comm.is_main_process():
            hooks.append(PeriodicWriter(self.build_writers()))
        return hooks

    def test(self):
        results = run_test(self.cfg, self.model, self.state.params,
                           self.state.model_state)
        if comm.is_main_process():
            verify_results(self.cfg, results)
        return results
