#!/usr/bin/env python
"""Per-geometry AR sampling benchmark (DSFVT / DSSVT / DSTSVT).

Measures sample_video (the jitted KV-cached rollout alone, no VQ-VAE) in
frames/sec/chip — the number BASELINE.md's per-geometry rows track. Sweeps
batch, KV dtype, and cache segment size:

  python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 8
  python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 32 \
      --kv int8 --seg 128
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/vt/DSSVT.yaml")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--kv", default="native", choices=["native", "int8", "int4"])
    p.add_argument("--weights", default="native",
                   choices=["native", "int8", "int8-pallas"],
                   help="stream per-pixel decoder weights as int8 "
                        "(per-column scales folded exactly; 'int8-pallas' "
                        "= native int8 MXU GEMM kernel, quantizes "
                        "activation rows too)")
    p.add_argument("--attn", default="xla",
                   choices=["xla", "pallas", "pallas-live"],
                   help="per-pixel attention impl: 'pallas' = fused-lane "
                        "decode kernel (with --kv int8: native int8 MXU "
                        "dots, supersedes --mm; with --kv native: "
                        "unquantized bf16 dots); 'pallas-live' = full "
                        "preallocated buffer + live-length flash-decode "
                        "kernel (requires --kv int8)")
    p.add_argument("--mm", default="native", choices=["native", "int8"],
                   help="run attention contractions as int8 x int8 MXU dots "
                        "(requires --kv int8; skips the cache dequant)")
    p.add_argument("--seg", type=int, default=0, help="cache segment size "
                   "(0 = heuristic max(64, block_run//4); capped at the "
                   "block run length)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--streams", type=int, default=1,
                   help="independent half-batch rollout streams advanced "
                        "alternately in one scan body (hides per-stream "
                        "serial latency under the other streams' cache "
                        "DMA; greedy output is stream-count-invariant)")
    p.add_argument("--class-num", type=int, default=0,
                   help="class-conditional sampling with this many classes "
                        "(KDSFVT runs 600; adds the class-embedding concat "
                        "to the encoder, videotransformer.py:29-31)")
    p.add_argument("--trace", default="", help="capture a profiler trace of "
                   "one timed iteration into this directory")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lvt_tpu.config import get_cfg
    from lvt_tpu.models import cast_floats
    from lvt_tpu.models.vt import VideoTransformer

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, args.config))
    if args.class_num > 0:
        cfg.MODEL.AUTOREGRESSIVE.VT.CLASS_NUM = args.class_num
    T, H, W = 16, 16, 16
    model = VideoTransformer(cfg, T=T, H=H, W=W)
    params, _ = model.init(jax.random.key(0))
    if args.dtype == "bfloat16":
        params = cast_floats(params, jnp.bfloat16)

    n_prime = cfg.TEST.VT_SAMPLER.N_PRIME
    B = args.batch
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.integers(0, model.c.nv, size=(B, model.c.nc, T, H, W)), jnp.int32)
    class_idx = (jnp.asarray(rng.integers(0, args.class_num, size=(B,)),
                             jnp.int32) if args.class_num > 0 else None)

    fn = jax.jit(lambda v, k: model.sample_video(
        params, v, k, n_prime=n_prime, class_idx=class_idx,
        kv_cache_dtype=args.kv,
        kv_seg_size=args.seg, weight_dtype=args.weights, mm_dtype=args.mm,
        attn_impl=args.attn, streams=args.streams))
    key = jax.random.key(7)
    fn(video, key).block_until_ready()  # compile

    if args.trace:
        jax.profiler.start_trace(args.trace)
        out = fn(video, jax.random.fold_in(key, 99))
        _ = int(np.asarray(out[0, 0, -1, 0, 0]))
        jax.profiler.stop_trace()

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = fn(video, jax.random.fold_in(key, i))
        _ = int(np.asarray(out[0, 0, -1, 0, 0]))  # host read = hard fence
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    fps = B * (T - n_prime) / med
    print(json.dumps({
        "config": os.path.basename(args.config),
        "batch": B, "kv": args.kv, "seg": args.seg, "mm": args.mm,
        "attn": args.attn, "streams": args.streams,
        "class_num": args.class_num,
        "n_prime": n_prime,
        "seconds_median": round(med, 3),
        "seconds_min": round(min(times), 3),
        "seconds_max": round(max(times), 3),
        "frames_per_sec_per_chip": round(fps, 1),
    }))


if __name__ == "__main__":
    main()
