#!/usr/bin/env python
"""TPU smoke test: run real train steps for both model families on the
attached accelerator (the pytest suite runs on CPU). Exercises the full
jitted train_step (bf16 compute), the Pallas kernels, and the eval adapters.

Usage: python tools/smoke_tpu.py [--steps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()

    import jax
    import numpy as np

    from lvt_tpu.config import get_cfg
    from lvt_tpu.engine import Trainer
    from lvt_tpu.parallel.mesh import build_mesh

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    root = os.path.join(os.path.dirname(__file__), "..")
    rng = np.random.default_rng(0)

    # ---- VQ-VAE (full PR-DVQVAE2 size, synthetic 64x64 frames)
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, "configs", "vqvae", "PR-DVQVAE2.yaml"))
    cfg.SOLVER.IMS_PER_BATCH = 32

    frames = rng.random((64, 64, 64, 3)).astype(np.float32)

    class VQLoader:
        def __iter__(self):
            while True:
                idx = rng.integers(0, 64, size=32)
                yield {"image": frames[idx]}

    t0 = time.perf_counter()
    trainer = Trainer(cfg, VQLoader(), mesh=build_mesh())
    trainer.metrics_period = 1
    trainer.train(0, args.steps)
    trainer.flush_metrics()
    losses = trainer.storage.history("loss_reconstruction").values()
    dt = time.perf_counter() - t0
    print(f"VQVAE: {args.steps} steps in {dt:.1f}s (incl compile), "
          f"loss {losses[0][0]:.4f} -> {losses[-1][0]:.4f}")

    # ---- DSFVT (full size, synthetic codes)
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, "configs", "vt", "DSFVT.yaml"))
    cfg.SOLVER.IMS_PER_BATCH = 16  # single chip smoke

    class VTLoader:
        def __iter__(self):
            while True:
                yield {"video": rng.integers(0, 512, size=(16, 4, 16, 16, 16)).astype(np.int32)}

    t0 = time.perf_counter()
    trainer = Trainer(cfg, VTLoader(), mesh=build_mesh())
    trainer.metrics_period = 1
    trainer.train(0, args.steps)
    trainer.flush_metrics()
    losses = trainer.storage.history("loss_cross_entropy").values()
    dt = time.perf_counter() - t0
    print(f"DSFVT: {args.steps} steps in {dt:.1f}s (incl compile), "
          f"loss {losses[0][0]:.4f} -> {losses[-1][0]:.4f}")

    # steady-state step time — metrics_period must exceed the window: a
    # per-step flush host-reads the loss, measuring the ~190 ms tunnel RTT
    # instead of compute (CLAUDE.md)
    trainer.metrics_period = args.steps * 2 + 1
    t0 = time.perf_counter()
    trainer.train(args.steps, args.steps * 2)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"DSFVT steady-state: {dt * 1000:.1f} ms/step at batch 16 "
          f"({16 / dt:.1f} videos/sec)")
    print("SMOKE OK")


if __name__ == "__main__":
    main()
