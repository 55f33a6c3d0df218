#!/usr/bin/env python
"""Full two-stage pipeline demo on real hardware with synthetic data:

  1. build a moving-squares video dataset (64x64 pngs, BAIR layout)
  2. train the full-size PR-DVQVAE2 VQ-VAE on its frames
  3. eval-only: MSE + CodesExtractor -> latent .npy dataset
  4. train full-size DSFVT on the extracted codes
  5. bits/dim eval + sample videos from priming frames -> pngs

Exercises every stage of SURVEY.md §3's call stacks end to end on device.

Usage: python tools/e2e_demo.py [--workdir /tmp/lvt_demo] [--iters1 300]
       [--iters2 300]

--cpu forces the CPU backend (the axon sitecustomize pins JAX_PLATFORMS, so
an env var alone cannot) and shrinks iters/dataset to smoke scale: the same
full-size architectures and every pipeline stage, runnable with no TPU
reachable. Expect ~5-10 min, dominated by the two train-step compiles.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def _write_video(d, n_frames, size, rng, motion=None):
    """One moving-squares video; motion=(dx,dy) overrides the random drift
    (class-conditional mode makes motion the class signal)."""
    os.makedirs(d, exist_ok=True)
    x0, y0 = rng.integers(5, 40, 2)
    dx, dy = rng.integers(-3, 4, 2) if motion is None else motion
    x1, y1 = rng.integers(5, 40, 2)
    dx1, dy1 = rng.integers(-3, 4, 2) if motion is None else motion
    c0 = rng.integers(100, 255, 3)
    c1 = rng.integers(100, 255, 3)
    yy, xx = np.mgrid[0:size, 0:size]
    bg = np.stack([(xx * 2) % 200, (yy * 2) % 200, ((xx + yy)) % 200],
                  -1).astype(np.uint8)
    for t in range(n_frames):
        img = bg.copy()
        ax = int(np.clip(x0 + dx * t, 0, size - 12))
        ay = int(np.clip(y0 + dy * t, 0, size - 12))
        bx = int(np.clip(x1 + dx1 * t, 0, size - 8))
        by = int(np.clip(y1 + dy1 * t, 0, size - 8))
        img[ay : ay + 12, ax : ax + 12] = c0
        img[by : by + 8, bx : bx + 8] = c1
        Image.fromarray(img).save(os.path.join(d, f"{t}.png"))


def make_dataset(root, n_videos=64, n_frames=16, size=64, seed=0):
    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        d = os.path.join(root, f"video_{v}")
        if os.path.exists(os.path.join(d, f"{n_frames - 1}.png")):
            continue
        _write_video(d, n_frames, size, rng)
    print(f"dataset ready: {n_videos} videos at {root}")


# Kinetics-600 class names (utils/labels.py) reused for the synthetic
# classes — the kinetics walkers map directory name -> class id through
# KINETICS_LABEL_IDX, so the on-disk layout matches the real pipeline
# (reference: vidgen/data/datasets/kinetics.py + lables.py).
DEMO_CLASSES = {
    "archery": (3, 0),          # horizontal motion
    "bowling": (0, 3),          # vertical motion
    "juggling balls": (2, 2),   # diagonal motion
}


def make_class_dataset(root, n_per_class=8, n_frames=16, size=64, seed=0):
    """Kinetics layout: <root>/<class name>/video_<i>/<t>.png; the squares'
    motion direction IS the class — a signal the class-conditional VT can
    pick up (KDSFVT conditioning, videotransformer.py:29-31,54-56)."""
    rng = np.random.default_rng(seed)
    for cname, motion in DEMO_CLASSES.items():
        for v in range(n_per_class):
            d = os.path.join(root, cname, f"video_{v}")
            if os.path.exists(os.path.join(d, f"{n_frames - 1}.png")):
                continue
            _write_video(d, n_frames, size, rng, motion=motion)
    print(f"dataset ready: {len(DEMO_CLASSES)} classes x {n_per_class} "
          f"videos at {root}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/lvt_demo")
    parser.add_argument("--iters1", type=int, default=None, help="VQ-VAE iters "
                        "(default 300, or 5 with --cpu)")
    parser.add_argument("--iters2", type=int, default=None, help="DSFVT iters "
                        "(default 300, or 5 with --cpu)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend + smoke-scale defaults "
                             "(no TPU required)")
    parser.add_argument("--class-conditional", action="store_true",
                        help="Kinetics-style class-conditional pipeline: "
                             "K-DVQVAE VQ-VAE -> class-labeled latents -> "
                             "KDSFVT (CLASS_NUM=600) -> class-conditioned "
                             "sampling (VERDICT r3 #6)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        # must precede any device query; env vars are clobbered by the axon
        # sitecustomize, only the in-process config override sticks
        jax.config.update("jax_platforms", "cpu")
    if args.iters1 is None:
        args.iters1 = 5 if args.cpu else 300
    if args.iters2 is None:
        args.iters2 = 5 if args.cpu else 300

    from lvt_tpu.config import get_cfg
    from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from lvt_tpu.data.datasets.latents import get_latent_video_paths
    from lvt_tpu.data import build_train_loader
    from lvt_tpu.engine import Trainer
    from lvt_tpu.engine.defaults import run_test
    from lvt_tpu.models.vt import VideoTransformer
    from lvt_tpu.parallel.mesh import build_mesh
    from lvt_tpu.utils.image import get_video_paths

    repo = os.path.join(os.path.dirname(__file__), "..")
    wd = args.workdir
    cc = args.class_conditional
    video_root = os.path.join(wd, "videos_cls" if cc else "videos")
    os.makedirs(video_root, exist_ok=True)
    if cc:
        make_class_dataset(video_root, n_per_class=3 if args.cpu else 22)
        DatasetCatalog.register(
            "demo_train", lambda: get_video_paths(
                video_root, use_cache=False, is_kinetics=True))
    else:
        make_dataset(video_root, n_videos=8 if args.cpu else 64)
        DatasetCatalog.register(
            "demo_train", lambda: get_video_paths(video_root, use_cache=False))
    MetadataCatalog.get("demo_train").set(root=video_root)

    # ---- stage 1: VQ-VAE training (full PR-DVQVAE2 / K-DVQVAE architecture)
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        repo, "configs", "vqvae", "K-DVQVAE.yaml" if cc else "PR-DVQVAE2.yaml"))
    cfg.DATASETS.TRAIN = ("demo_train",)
    cfg.DATASETS.TEST = ("demo_train",)
    if not cc:
        cfg.INPUT.N_FRAMES_PER_VIDEO_TRAIN = 2  # frames per sampled clip
    # K-DVQVAE trains on single frames (N_FRAMES_PER_VIDEO_TRAIN: 1 in yaml)
    cfg.SOLVER.IMS_PER_BATCH = 8 if args.cpu else 16
    cfg.OUTPUT_DIR = os.path.join(wd, "vqvae_out_cls" if cc else "vqvae_out")

    t0 = time.perf_counter()
    loader, _ = build_train_loader(cfg)
    trainer = Trainer(cfg, loader, mesh=build_mesh())
    trainer.train(0, args.iters1)
    trainer.flush_metrics()
    rec = trainer.storage.history("loss_reconstruction")
    print(f"[stage1] VQ-VAE {args.iters1} iters in {time.perf_counter()-t0:.0f}s; "
          f"recon {rec.values()[0][0]:.4f} -> {rec.median(20):.4f}")

    # ---- stage 2: extract codes
    t0 = time.perf_counter()
    results = run_test(cfg, trainer.model, trainer.state.params,
                       trainer.state.model_state)
    print(f"[stage2] eval in {time.perf_counter()-t0:.0f}s: "
          f"MSE={results['reconstruction']['MSE']:.5f}")
    codes_root = os.path.join(cfg.OUTPUT_DIR, "inference", "demo_train")
    # class-conditional codes nest under <class name>/video_<i>
    n_code_videos = sum(d.startswith("video_")
                        for _, dirs, _ in os.walk(codes_root) for d in dirs)
    assert n_code_videos > 0, f"no codes extracted under {codes_root}"
    print(f"[stage2] extracted codes for {n_code_videos} videos -> {codes_root}")

    # ---- stage 3: DSFVT / KDSFVT on the extracted codes
    DatasetCatalog.register(
        "demo_latents", lambda: get_latent_video_paths(
            codes_root, use_cache=False, is_kinetics=cc))
    MetadataCatalog.get("demo_latents").set(root=codes_root)

    vt_cfg = get_cfg()
    vt_cfg.merge_from_file(os.path.join(
        repo, "configs", "vt", "KDSFVT.yaml" if cc else "DSFVT.yaml"))
    vt_cfg.DATASETS.TRAIN = ("demo_latents",)
    vt_cfg.DATASETS.TEST = ("demo_latents",)
    if cc:
        # the Kinetics run conditions on the 600-way class id
        # (reference videotransformer.py:29-31: CLASS_NUM > 0 doubles the
        # encoder projector input with a class embedding)
        vt_cfg.MODEL.AUTOREGRESSIVE.VT.CLASS_NUM = 600
    vt_cfg.SOLVER.IMS_PER_BATCH = 8 if args.cpu else 16
    vt_cfg.TEST.N_SAMPLES = 4
    vt_cfg.OUTPUT_DIR = os.path.join(wd, "vt_out_cls" if cc else "vt_out")
    # (no VTSampler evaluator here — stage 4 runs BitsEvaluator only; the
    # sampling + decode demo happens manually below)

    t0 = time.perf_counter()
    vt_loader, _ = build_train_loader(vt_cfg)
    vt = VideoTransformer(vt_cfg, T=16, H=16, W=16)
    vt_trainer = Trainer(vt_cfg, vt_loader, model=vt, mesh=build_mesh())
    vt_trainer.train(0, args.iters2)
    vt_trainer.flush_metrics()
    ce = vt_trainer.storage.history("loss_cross_entropy")
    print(f"[stage3] DSFVT {args.iters2} iters in {time.perf_counter()-t0:.0f}s; "
          f"CE {ce.values()[0][0]:.3f} -> {ce.median(20):.3f} nats "
          f"(uniform = {np.log(512):.3f})")

    # ---- stage 4: bits/dim eval + generation
    import jax.numpy as jnp

    from lvt_tpu.models import cast_floats

    vt_cfg2 = vt_cfg.clone()
    vt_cfg2.TEST.EVALUATORS = "BitsEvaluator"
    t0 = time.perf_counter()
    bits = run_test(vt_cfg2, vt, vt_trainer.state.params, {})
    print(f"[stage4] bits/dim = {bits['likelihood']['bits_per_dim']:.3f} "
          f"(uniform = {np.log2(512):.2f}) in {time.perf_counter()-t0:.0f}s")

    # generation: prime with 5 frames of a training video's codes
    lat = get_latent_video_paths(codes_root, use_cache=False, is_kinetics=cc)[0]
    frames = [np.load(os.path.join(lat["video_root"], f)) for f in lat["latent_names"]]
    video = np.stack(frames).transpose(1, 0, 2, 3)[None].astype(np.int32)  # (1, nc, T, h, w)
    params_bf16 = cast_floats(vt_trainer.state.params, jnp.bfloat16)

    t0 = time.perf_counter()
    if cc:
        from lvt_tpu.utils.labels import (KINETICS_IDX_LABEL,
                                          KINETICS_LABEL_IDX)

        true_cls = int(lat["class"])
        alt_cls = next(c for c in
                       (KINETICS_LABEL_IDX[n] for n in DEMO_CLASSES)
                       if c != true_cls)
        sample_fn = jax.jit(lambda v, c, k: vt.sample_video(
            params_bf16, v, k, n_prime=5, class_idx=c))
        vj = jnp.asarray(video)
        sample = sample_fn(vj, jnp.asarray([true_cls], jnp.int32),
                           jax.random.key(0))
        # same priming + same key, different class id: the rollouts must
        # differ — the class embedding reaches every sampled logit through
        # the encoder (vt_encode class concat)
        sample_alt = sample_fn(vj, jnp.asarray([alt_cls], jnp.int32),
                               jax.random.key(0))
        n_diff = int(np.sum(np.asarray(sample) != np.asarray(sample_alt)))
        assert n_diff > 0, "class conditioning had no effect on sampling"
        print(f"[class-conditional] sampling conditioned on "
              f"{KINETICS_IDX_LABEL[true_cls]!r} (id {true_cls}) vs "
              f"{KINETICS_IDX_LABEL[alt_cls]!r} (id {alt_cls}): "
              f"{n_diff} of {sample.size} codes differ OK")
    else:
        sample = jax.jit(lambda v, k: vt.sample_video(params_bf16, v, k, n_prime=5))(
            jnp.asarray(video), jax.random.key(0))
    sample.block_until_ready()
    gen_t = time.perf_counter() - t0
    # decode with the stage-1 VQ-VAE
    idx = jnp.transpose(sample[0], (1, 2, 3, 0))  # (T, h, w, nc)
    out = trainer.model.decode(trainer.state.params, trainer.state.model_state, idx)
    out = np.clip(np.asarray(trainer.model.denormalize(out)) * 255.0, 0, 255).astype(np.uint8)
    gen_dir = os.path.join(wd, "generated_cls" if cc else "generated")
    os.makedirs(gen_dir, exist_ok=True)
    for i, frame in enumerate(out):
        Image.fromarray(frame).save(os.path.join(gen_dir, f"{i}.png"))
    print(f"[stage5] sampled+decoded 16 frames (incl compile {gen_t:.0f}s) -> {gen_dir}")
    print("E2E CLASS-CONDITIONAL DEMO OK" if cc else "E2E DEMO OK")


if __name__ == "__main__":
    main()
