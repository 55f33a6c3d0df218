#!/usr/bin/env python
"""Training-throughput benchmark: steady-state s/it for the two flagship
training configs at their reference batch sizes (BASELINE.md training-budget
rows: VQ-VAE batch 32, DSFVT batch 64).

Usage: python tools/bench_train.py [--steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _measure(trainer, steps):
    """Device step time: chained jitted steps on a device-resident batch,
    fenced by a host read of the loss. (The old per-step-sync method
    measured the ~190 ms remote-tunnel round trip, not compute —
    BASELINE.md round-2 methodology.)"""
    batch = trainer._put_batch(next(iter(trainer._data_loader)))
    step, state, key = trainer._train_step, trainer.state, trainer._step_key
    for _ in range(3):  # compile + warmup
        state, metrics = step(state, batch, key)
    float(next(iter(metrics.values())))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch, key)
    float(next(iter(metrics.values())))  # hard fence
    trainer.state = state
    return (time.perf_counter() - t0) / steps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    import numpy as np

    from lvt_tpu.config import get_cfg
    from lvt_tpu.engine import Trainer
    from lvt_tpu.parallel.mesh import build_mesh

    root = os.path.join(os.path.dirname(__file__), "..")
    rng = np.random.default_rng(0)
    results = {}

    # ---- PR-DVQVAE2 @ reference batch 32, 64x64 frames
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, "configs", "vqvae", "PR-DVQVAE2.yaml"))
    frames = rng.random((128, 64, 64, 3)).astype(np.float32)

    class VQLoader:
        def __iter__(self):
            while True:
                idx = rng.integers(0, 128, size=32)
                yield {"image": frames[idx]}

    t = Trainer(cfg, VQLoader(), mesh=build_mesh())
    s = _measure(t, args.steps)
    results["vqvae_batch32_s_per_it"] = round(s, 4)
    results["vqvae_images_per_sec"] = round(32 / s, 1)

    # ---- DSFVT @ reference batch 64
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, "configs", "vt", "DSFVT.yaml"))

    class VTLoader:
        def __iter__(self):
            while True:
                yield {"video": rng.integers(
                    0, 512, size=(64, 4, 16, 16, 16)).astype(np.int32)}

    t = Trainer(cfg, VTLoader(), mesh=build_mesh())
    s = _measure(t, args.steps)
    results["dsfvt_batch64_s_per_it"] = round(s, 4)
    results["dsfvt_videos_per_sec"] = round(64 / s, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
