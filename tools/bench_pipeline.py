#!/usr/bin/env python
"""Training throughput THROUGH the real input pipeline (VERDICT r3 #3).

Every BASELINE.md training number so far is device-step time on a
device-resident batch; the reference's numbers inherently include its
DataLoader (vidgen/engine/trainer.py:61-66 measures data_time every step,
vidgen/data/build.py:41-74 builds the worker pool). This tool closes the
gap with three measurements over synthetic on-disk datasets at reference
scale:

  --gen           write the datasets:
                    <workdir>/latents/video_<i>/<t>.npy — CodesExtractor
                      layout (evaluation/codes_extractor.py:40-42): (nc,h,w)
                      int32 codes, 16 frames/video (DSFVT's stage-2 input)
                    <workdir>/frames/video_<i>/<t>.png — BAIR layout 64x64
                      RGB (PR-DVQVAE2's input)
  --loader-only   iterate build_train_loader with no device in the loop:
                    steady-state batches/s -> videos/s (DSFVT) or img/s
                    (PR-DVQVAE2). This is the "can the thread-prefetch
                    loader feed 1199 videos/s" question in isolation.
  (default)       >=200 Trainer.run_step iterations on the real chip through
                    _PrefetchLoader -> _put_batch -> jitted step; report
                    steady-state it/s + mean host data_time, next to the
                    device-only anchor measured the bench_train way on the
                    same trainer, plus a separately-timed H2D batch transfer
                    (on this rig the axon tunnel moves bulk data at
                    ~50 MB/s — three orders of magnitude under a real TPU
                    host's PCIe — so the transfer term is reported, not
                    hidden in it/s).

Usage:
  python tools/bench_pipeline.py --gen
  python tools/bench_pipeline.py --loader-only --config vt
  python tools/bench_pipeline.py --config vt --steps 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WORKDIR = "/tmp/lvt_pipeline"


# ---------------------------------------------------------------------------
# dataset generation
# ---------------------------------------------------------------------------

def gen_latents(root, n_videos=1024, n_frames=16, nc=4, h=16, w=16, nv=512,
                seed=0):
    """Latent .npy trees exactly as CodesExtractor writes them."""
    rng = np.random.default_rng(seed)
    for v in range(n_videos):
        d = os.path.join(root, f"video_{v}")
        if os.path.exists(os.path.join(d, f"{n_frames - 1}.npy")):
            continue
        os.makedirs(d, exist_ok=True)
        codes = rng.integers(0, nv, size=(n_frames, nc, h, w)).astype(np.int32)
        for t in range(n_frames):
            np.save(os.path.join(d, f"{t}.npy"), codes[t])
    print(f"latents ready: {n_videos} videos x {n_frames} frames at {root}")


def gen_frames(root, n_videos=256, n_frames=16, size=64, seed=0):
    """BAIR-layout png trees (reuses the e2e demo's moving-squares videos)."""
    from e2e_demo import make_dataset

    make_dataset(root, n_videos=n_videos, n_frames=n_frames, size=size,
                 seed=seed)


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

def build_cfg(which, workdir, batch):
    from lvt_tpu.config import get_cfg
    from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from lvt_tpu.data.datasets.latents import get_latent_video_paths
    from lvt_tpu.utils.image import get_image_paths

    repo = os.path.join(os.path.dirname(__file__), "..")
    cfg = get_cfg()
    if which == "vt":
        root = os.path.join(workdir, "latents")
        name = "pipe_latents"
        if name not in DatasetCatalog.list():
            DatasetCatalog.register(
                name, lambda: get_latent_video_paths(root, use_cache=False))
            MetadataCatalog.get(name).set(root=root)
        cfg.merge_from_file(os.path.join(repo, "configs", "vt", "DSFVT.yaml"))
        if batch:
            cfg.SOLVER.IMS_PER_BATCH = batch
    else:
        root = os.path.join(workdir, "frames")
        name = "pipe_frames"
        if name not in DatasetCatalog.list():
            # PR-DVQVAE2 trains on individual frames ("bair_train",
            # load_images=True): per-image dicts through the image_path
            # mapper branch
            DatasetCatalog.register(
                name, lambda: get_image_paths(root, use_cache=False))
            MetadataCatalog.get(name).set(root=root)
        cfg.merge_from_file(os.path.join(repo, "configs", "vqvae",
                                         "PR-DVQVAE2.yaml"))
        if batch:
            cfg.SOLVER.IMS_PER_BATCH = batch
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.OUTPUT_DIR = os.path.join(workdir, f"out_{which}")
    return cfg


def _items_per_batch(which, cfg):
    """Videos per batch for the VT (one latent stack per sample), images per
    batch for the VQ-VAE."""
    return cfg.SOLVER.IMS_PER_BATCH


# ---------------------------------------------------------------------------
# measurements
# ---------------------------------------------------------------------------

def measure_loader(cfg, which, batches, workers):
    from lvt_tpu.data import build_train_loader

    if workers:
        cfg.DATALOADER.NUM_WORKERS = workers
    loader, n = build_train_loader(cfg)
    it = iter(loader)
    warm = min(8, batches // 4 + 1)
    for _ in range(warm):
        next(it)
    t0 = time.perf_counter()
    for _ in range(batches):
        b = next(it)
    dt = time.perf_counter() - t0
    per = _items_per_batch(which, cfg)
    key = "video" if which == "vt" else "image"
    return {
        "mode": "loader_only", "config": which,
        "dataset_size": n, "workers": cfg.DATALOADER.NUM_WORKERS,
        "batch": per, "batches": batches,
        "batch_shape": list(np.asarray(b[key]).shape),
        "batch_mb": round(np.asarray(b[key]).nbytes / 2**20, 2),
        "batches_per_sec": round(batches / dt, 2),
        "items_per_sec": round(batches * per / dt, 1),
        "sec_per_batch": round(dt / batches, 5),
    }


def measure_e2e(cfg, which, steps, workers):
    """steps Trainer.run_step iterations (real loader + H2D + jitted step),
    fenced ONCE at the end by a host read of the last step's loss — per-step
    host syncs measure the ~190 ms tunnel RTT, not compute (BASELINE.md
    round-2 methodology)."""
    import jax

    from lvt_tpu.data import build_train_loader
    from lvt_tpu.engine import Trainer
    from lvt_tpu.parallel.mesh import build_mesh

    if workers:
        cfg.DATALOADER.NUM_WORKERS = workers
    loader, _ = build_train_loader(cfg)
    trainer = Trainer(cfg, loader, mesh=build_mesh())

    # warmup: compile + fill the prefetch queue
    for _ in range(3):
        trainer.run_step()
        trainer.iter += 1
    last = trainer._pending_metrics[-1][2]
    float(next(iter(last.values())))  # fence the compile
    trainer._pending_metrics.clear()

    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.run_step()
        trainer.iter += 1
    last = trainer._pending_metrics[-1][2]
    float(next(iter(last.values())))  # single hard fence
    wall = time.perf_counter() - t0
    data_times = [dt for _, dt, _ in trainer._pending_metrics]
    trainer._pending_metrics.clear()

    # device-only anchor on the SAME trainer/state (bench_train methodology)
    batch = trainer._put_batch(next(iter(trainer._data_loader)))
    step, state, key = trainer._train_step, trainer.state, trainer._step_key
    for _ in range(3):
        state, metrics = step(state, batch, key)
    float(next(iter(metrics.values())))
    t0 = time.perf_counter()
    anchor_steps = min(steps, 30)
    for _ in range(anchor_steps):
        state, metrics = step(state, batch, key)
    float(next(iter(metrics.values())))
    device_only = (time.perf_counter() - t0) / anchor_steps

    # H2D transfer term, timed alone (device_put + fence on a scalar read)
    h2d = None
    key_name = "video" if which == "vt" else "image"
    raw = next(iter(trainer._data_loader))
    for _ in range(2):
        t0 = time.perf_counter()
        placed = trainer._put_batch(raw)
        np.asarray(jax.device_get(placed[key_name][0, 0]))  # fence small
        h2d = time.perf_counter() - t0
    batch_mb = raw[key_name].nbytes / 2**20
    # _put_batch ships config-bounded int32 code/class fields as int16 on
    # the wire (trainer._narrow_i16); report the actual wire bytes so the
    # MB/s row is a link rate, not logical throughput (ADVICE r4)
    wire_mb = sum(
        (v.nbytes // 2 if (k in getattr(trainer, "_narrow_i16", set())
                           and getattr(v, "dtype", None) == np.int32)
         else getattr(v, "nbytes", 0))
        for k, v in raw.items() if hasattr(v, "nbytes")) / 2**20

    per = _items_per_batch(which, cfg)
    return {
        "mode": "pipeline_e2e", "config": which,
        "batch": per, "workers": cfg.DATALOADER.NUM_WORKERS, "steps": steps,
        "backend": jax.default_backend(),
        "sec_per_iter": round(wall / steps, 5),
        "items_per_sec": round(steps * per / wall, 1),
        "device_only_sec_per_iter": round(device_only, 5),
        "pipeline_overhead_pct": round(
            100.0 * (wall / steps - device_only) / device_only, 1),
        "data_time_mean_ms": round(1e3 * float(np.mean(data_times)), 2),
        "data_time_max_ms": round(1e3 * float(np.max(data_times)), 2),
        "h2d_batch_mb": round(batch_mb, 2),
        "h2d_wire_mb": round(wire_mb, 2),
        "h2d_sec": round(h2d, 4),
        "h2d_logical_mbps": round(batch_mb / h2d, 1),
        "h2d_wire_mbps": round(wire_mb / h2d, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=WORKDIR)
    p.add_argument("--gen", action="store_true", help="generate the datasets")
    p.add_argument("--n-videos", type=int, default=1024,
                   help="[--gen] latent videos (16 frames each)")
    p.add_argument("--n-frame-videos", type=int, default=256,
                   help="[--gen] png videos (16 frames each)")
    p.add_argument("--loader-only", action="store_true")
    p.add_argument("--config", choices=["vt", "vqvae"], default="vt")
    p.add_argument("--batch", type=int, default=0,
                   help="override IMS_PER_BATCH (0 = reference budget)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batches", type=int, default=50,
                   help="[--loader-only] timed batches")
    p.add_argument("--workers", type=int, default=0,
                   help="override DATALOADER.NUM_WORKERS (0 = config)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke)")
    args = p.parse_args()

    if args.gen:
        gen_latents(os.path.join(args.workdir, "latents"),
                    n_videos=args.n_videos)
        gen_frames(os.path.join(args.workdir, "frames"),
                   n_videos=args.n_frame_videos)
        return

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg = build_cfg(args.config, args.workdir, args.batch)
    if args.loader_only:
        out = measure_loader(cfg, args.config, args.batches, args.workers)
    else:
        out = measure_e2e(cfg, args.config, args.steps, args.workers)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
