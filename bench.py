#!/usr/bin/env python
"""Benchmark: end-to-end 16-frame 64x64 BAIR video generation throughput.

Measures the full flagship pipeline — VQ-VAE encode of 5 priming frames ->
DSFVT subscale AR rollout (16 slices x 256 pixels x 4 channel substeps) ->
VQ-VAE decode — as ONE jitted program, and reports frames/sec/chip.

Baseline: the same math executed the way the reference executes it
(vidgen/modeling/meta_arch/vt.py:107-131 + videotransformer.py:240-246):
full decoder recompute for every pixel with a host dispatch per pixel and no
KV reuse across pixels. We measure that reference-style loop on the same
chip (a small pixel subset, extrapolated) so vs_baseline compares algorithms
on identical hardware; the reference's own GPU/torch numbers are unpublished
(BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    # batch sweep with int8 KV + seg 16, device-staged inputs (BASELINE.md):
    # 256->783.3, 512->812.0, 1024->831.8 fps; 2048 cannot fit (int8 caches
    # alone ~17 GB > 16 GB HBM). (The pre-staging-fix sweep read 512 as
    # flat at 604 — it was timing a 2.5 s host->device tunnel copy each
    # iteration; with inputs staged once, larger batches amortize the
    # per-pixel weight stream and keep winning a few % each doubling.)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                        help="sampling weight/activation dtype (softmax/logits stay fp32)")
    parser.add_argument("--weights", default="native",
                        choices=["native", "int8", "int8-pallas"],
                        help="stream per-pixel decoder weights as int8 "
                             "('int8-pallas' = native int8 MXU GEMM kernel, "
                             "quantizes activation rows too)")
    parser.add_argument("--attn", default="xla",
                        choices=["xla", "pallas", "pallas-live"],
                        help="per-pixel attention impl: 'pallas' = fused-"
                             "lane decode kernel (with --kv int8: native "
                             "int8 MXU dots, supersedes --mm; with --kv "
                             "native: unquantized bf16 dots); 'pallas-live'"
                             " = full preallocated buffer + live-length "
                             "flash-decode kernel (requires --kv int8; no "
                             "segment concat copies)")
    parser.add_argument("--mm", default="native", choices=["native", "int8"],
                        help="run the sampler's attention contractions as "
                             "int8 x int8 MXU dots reading the cache bytes "
                             "directly (requires --kv int8; skips the "
                             "int8->bf16 cache dequant)")
    parser.add_argument("--kv", default="int8", choices=["native", "int8", "int4"],
                        help="KV-cache storage dtype in the sampler (int8 = "
                             "per-row absmax quantized caches, exact scale "
                             "folding, +58%% at batch 128; greedy agreement "
                             "tested; --kv native for bit-exact caches — "
                             "NOTE: native bf16 caches are 2x the int8 "
                             "bytes, so the b1024 default only fits HBM "
                             "with int8; use --batch 512 or less with "
                             "native)")
    parser.add_argument("--seg", type=int, default=16,
                        help="KV-cache growth segment (0 = heuristic "
                             "max(64, block_run//4)). Sweep at "
                             "batch 128 int8: 64->543.6, 32->553.6, "
                             "16->563.6, 8->536.4 fps — the over-read past "
                             "the current pixel shrinks with seg until scan "
                             "overhead wins")
    parser.add_argument("--full-recompute", action="store_true",
                        help="disable the KV-cached decoder (reference formulation)")
    parser.add_argument("--baseline-pixels", type=int, default=64,
                        help="pixels to measure for the reference-style loop "
                             "(extrapolated to the full video; more pixels = "
                             "steadier denominator)")
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--mesh", type=int, default=0,
                        help="data-parallel ways (0/1 = single device). "
                             "Shards the batch over an N-device data mesh "
                             "(the v5e-8 serving scale-out — a PROJECTION "
                             "on this 1-chip rig: correctness is "
                             "CPU-mesh-tested, multi-chip fps is not a "
                             "measurement); the metric "
                             "stays frames/sec/CHIP (total/N), detail "
                             "carries the total. Requires --skip-baseline: "
                             "vs_baseline is a same-chip algorithm "
                             "comparison and is not defined at mesh scale")
    parser.add_argument("--streams", type=int, default=1,
                        help="independent rollout streams advanced "
                             "alternately inside the pixel scan (each "
                             "carries batch/streams rows and its own KV "
                             "caches; a stream's serial latency hides "
                             "under the others' cache DMA). Greedy-exact; "
                             "temp sampling uses per-stream keys")
    parser.add_argument("--no-hbm-gate", action="store_true",
                        help="skip the KV-cache HBM footprint pre-check "
                             "(the gate extrapolates linearly from one "
                             "measured point and slightly over-counts "
                             "native KV, which carries no scale rows — "
                             "near-threshold configs that actually fit can "
                             "use this to run anyway)")
    parser.add_argument("--probe", action="store_true",
                        help="also time one half-batch run and check that "
                             "gen_seconds scales ~linearly (costs one extra "
                             "compile; the physical-bound self-check always "
                             "runs)")
    args = parser.parse_args()
    n_mesh = max(args.mesh, 1)
    if n_mesh > 1:
        if not args.skip_baseline:
            parser.error("--mesh N requires --skip-baseline (vs_baseline is "
                         "a same-chip algorithm comparison)")
        if args.batch % (2 * n_mesh if args.probe else n_mesh):
            parser.error(f"--batch {args.batch} must divide evenly over "
                         f"--mesh {n_mesh} shards"
                         + (" (and over 2*mesh for --probe)" if args.probe
                            else ""))
    if args.full_recompute:
        # _sample_slice_pixels (vt.py) ignores every KV-cache knob; refuse
        # flag combinations that would label the JSON with settings the
        # run never used
        for flag, val, default in (("--attn", args.attn, "xla"),
                                   ("--weights", args.weights, "native"),
                                   ("--mm", args.mm, "native"),
                                   ("--streams", args.streams, 1)):
            if val != default:
                parser.error(f"--full-recompute bypasses the KV-cached "
                             f"sampler; {flag} {val} has no effect there")
    else:
        # HBM footprint gate (ADVICE r3): KV caches dominate residency —
        # measured ~8.6 GB at batch 1024 with int8 KV (BASELINE.md). bf16
        # caches carry 2x the bytes and fp32 4x, so `--kv native` at the
        # b1024 default would blow v5e's 16 GB before the rollout starts.
        rel_bytes = {"int4": 0.5, "int8": 1.0,
                     "native": 4.0 if args.dtype == "float32" else 2.0}
        per_chip_batch = args.batch // n_mesh
        est_gb = 8.6 * (per_chip_batch / 1024.0) * rel_bytes[args.kv]
        if est_gb > 14.0 and not args.no_hbm_gate:
            fit_batch = max(128, int(per_chip_batch * 12.0 / est_gb)
                            // 128 * 128)
            msg = (
                f"--kv {args.kv} (--dtype {args.dtype}) at batch "
                f"{per_chip_batch}/chip needs ~{est_gb:.1f} GB of KV cache "
                f"residency (scaling from the measured 8.6 GB at b1024 "
                f"int8) — over v5e's 16 GB HBM. Lower --batch (~{fit_batch} "
                f"fits) or use --kv int8.")
            if est_gb <= 16.0:
                # borderline: the estimate is a linear extrapolation and
                # over-counts native KV (no scale rows) — warn, don't block
                sys.stderr.write(
                    f"bench.py: WARNING: {msg} Proceeding anyway (estimate "
                    f"is borderline; pass --no-hbm-gate to silence).\n")
            else:
                parser.error(msg + " (--no-hbm-gate overrides)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lvt_tpu.config import get_cfg
    from lvt_tpu.models import cast_floats
    from lvt_tpu.models.vqvae import VQVAE
    from lvt_tpu.models.vt import VideoTransformer

    root = os.path.dirname(os.path.abspath(__file__))

    vt_cfg = get_cfg()
    vt_cfg.merge_from_file(os.path.join(root, "configs", "vt", "DSFVT.yaml"))
    vq_cfg = get_cfg()
    vq_cfg.merge_from_file(os.path.join(root, "configs", "vqvae", "PR-DVQVAE2.yaml"))

    vt = VideoTransformer(vt_cfg, T=16, H=16, W=16)
    vt_params, _ = vt.init(jax.random.key(0))
    vq = VQVAE(vq_cfg)
    vq_params, vq_state = vq.init(jax.random.key(1))
    if args.dtype == "bfloat16":
        vt_params = cast_floats(vt_params, jnp.bfloat16)

    B = args.batch
    T, H, W = 16, 64, 64
    n_prime = vt_cfg.TEST.VT_SAMPLER.N_PRIME
    rng = np.random.default_rng(0)
    frames_host = rng.random((B * n_prime, H, W, 3)).astype(np.float32)
    # Stage the priming frames on device ONCE, outside the timed region.
    # Input staging is not the benchmarked quantity (generation throughput),
    # and on this rig the host->device link is a remote tunnel at ~50 MB/s
    # (1.25 s for this 62 MB batch-256 buffer, measured) — three orders of
    # magnitude off the PCIe copy a real TPU host would do (~20 ms).
    if n_mesh > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lvt_tpu.parallel.mesh import build_mesh

        mesh = build_mesh(data=n_mesh, model=1)
        stage = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
        # params replicated on every chip; each shard rolls out its batch
        replicate = lambda t: jax.device_put(t, NamedSharding(mesh, P()))
        vt_params = replicate(vt_params)
        vq_params = replicate(vq_params)
        vq_state = replicate(vq_state)
    else:
        stage = jax.device_put
    frames = stage(frames_host)
    frames.block_until_ready()

    def make_generate(batch):
        """The benchmarked program at a given batch size — ONE factory so
        the half-batch linearity probe times the exact same program (a
        hand-copied variant would silently drift as sampler flags are
        added)."""

        @jax.jit
        def generate(frames, key):
            x = vq.normalize(frames)
            codes = vq.encode(vq_params, vq_state, x)  # (batch*n_prime, h, w, nc)
            codes = codes.reshape(batch, n_prime, 16, 16, vt.c.nc)
            codes = jnp.transpose(codes, (0, 4, 1, 2, 3))  # (batch, nc, n_prime, h, w)
            video = jnp.zeros((batch, vt.c.nc, 16, 16, 16), jnp.int32)
            video = video.at[:, :, :n_prime].set(codes)
            sampled = vt.sample_video(vt_params, video, key, n_prime=n_prime,
                                      incremental=not args.full_recompute,
                                      kv_cache_dtype=args.kv,
                                      kv_seg_size=args.seg,
                                      weight_dtype=args.weights,
                                      mm_dtype=args.mm,
                                      attn_impl=args.attn,
                                      streams=args.streams)
            idx = jnp.transpose(sampled, (0, 2, 3, 4, 1)).reshape(
                batch * 16, 16, 16, vt.c.nc)
            out = vq.decode(vq_params, vq_state, idx)
            return jnp.clip(vq.denormalize(out), 0.0, 1.0)

        return generate

    generate = make_generate(B)

    def timed_run(k):
        """One timed generation, fenced by a HOST READ of the output.

        `block_until_ready()` is NOT a reliable fence through the axon
        remote-TPU tunnel (BENCH_r02 recorded a physically impossible
        0.012 s for a batch-256 rollout this way); pulling one element to
        the host cannot return before the dependent computation finishes.
        """
        t0 = time.perf_counter()
        out = generate(frames, k)
        fence = float(out[0, 0, 0, 0])  # device->host read = the fence
        dt = time.perf_counter() - t0
        assert np.isfinite(fence), "generation produced non-finite pixels"
        return dt

    # compile + warmup
    key = jax.random.key(7)
    timed_run(key)

    times = [timed_run(jax.random.fold_in(key, i)) for i in range(args.iters)]
    times_sorted = sorted(times)
    med = float(np.median(times))
    frames_generated = B * (T - n_prime)  # newly generated frames, all chips
    fps_total = frames_generated / med
    fps = fps_total / n_mesh  # the metric stays per chip
    tokens_per_sec = B * (T - n_prime) * 16 * 16 * vt.c.nc / med / n_mesh

    st, sh, sw = vt.plan.slice_shape
    seq_steps = (vt.plan.num_slices - n_prime) * (st * sh * sw) * vt.c.nc
    err = check_plausible(med, seq_steps)
    if err:
        sys.stderr.write("bench.py: REFUSING to report: " + err + "\n")
        sys.exit(1)

    probe = None
    if args.probe and B >= 2:
        # Linearity probe: half the batch should take noticeably less than
        # the full batch but never < ~25% of it (sampling is bandwidth-bound
        # so sub-linear scaling is expected; super-linear or flat-zero is a
        # broken fence).
        probe = _probe_half_batch(jax, np, make_generate, frames_host,
                                  args.batch, n_prime, key, stage)
        if probe < 0.25 * med / 2:
            sys.stderr.write(
                "bench.py: REFUSING to report: half-batch probe %.4f s is "
                "<25%% of half the full-batch median %.4f s — timing is not "
                "tracking real work.\n" % (probe, med))
            sys.exit(1)

    vs_baseline = None
    if not args.skip_baseline:
        vs_baseline = _reference_style_baseline(
            jax, jnp, np, vt, vt_params, args.baseline_pixels, B, n_prime, fps)

    result = {
        "metric": "frames/sec/chip 16-frame 64x64 BAIR generation (end-to-end jit: VQVAE encode + DSFVT AR rollout + VQVAE decode)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "batch": B,
            "gen_seconds_median": round(med, 3),
            "gen_seconds_min": round(times_sorted[0], 3),
            "gen_seconds_max": round(times_sorted[-1], 3),
            "gen_seconds_all": [round(t, 3) for t in times],
            "fence": "host read of out[0,0,0,0] per iteration",
            "ar_tokens_per_sec": round(tokens_per_sec, 1),
            "seq_dependent_steps": seq_steps,
            "probe_half_batch_seconds": round(probe, 3) if probe else None,
            "dtype": args.dtype,
            # full_recompute ignores every KV-cache knob — null them so the
            # JSON never attributes settings the run didn't use
            "kv_cache": None if args.full_recompute else args.kv,
            "weights": None if args.full_recompute else args.weights,
            "mm": None if args.full_recompute else args.mm,
            "seg": None if args.full_recompute else args.seg,
            "attn": None if args.full_recompute else args.attn,
            "streams": None if args.full_recompute else args.streams,
            "sampler": "full_recompute" if args.full_recompute else "kv_cache",
            "mesh_data": n_mesh,
            "fps_total_all_chips": round(fps_total, 3) if n_mesh > 1 else None,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


# No hardware finishes a sequentially dependent AR sampling step (matmul
# chain + cache update, round-trip through HBM) in under this many seconds.
MIN_SEC_PER_STEP = 2e-6


def check_plausible(gen_seconds, seq_steps):
    """Return an error string if `gen_seconds` for `seq_steps` sequentially
    dependent AR steps is physically impossible (a broken timing fence, as
    in BENCH_r02's 0.012 s capture), else None."""
    if gen_seconds < seq_steps * MIN_SEC_PER_STEP:
        return ("median gen time %.4f s implies %.2e s per sequentially "
                "dependent AR step (< %.0e s floor over %d steps). The "
                "timing fence did not hold; this is a measurement artifact, "
                "not throughput." % (gen_seconds, gen_seconds / seq_steps,
                                     MIN_SEC_PER_STEP, seq_steps))
    return None


def _probe_half_batch(jax, np, make_generate, frames_host, batch, n_prime,
                      key, stage):
    """Time one generation at batch B//2 (the same program via the shared
    factory, own compile), host-read fenced. Slices the retained HOST copy
    of the frames — np.asarray on the staged device buffer would drag all
    62 MB back through the ~50 MB/s tunnel."""
    import time as _t

    B2 = batch // 2
    frames2 = frames_host.reshape(batch, n_prime, 64, 64, 3)[:B2]
    frames2 = frames2.reshape(B2 * n_prime, 64, 64, 3)
    frames2 = stage(frames2)  # staged+sharded like the main loop's input
    frames2.block_until_ready()

    generate2 = make_generate(B2)
    k = jax.random.fold_in(key, 10_001)
    float(generate2(frames2, k)[0, 0, 0, 0])  # compile + warmup
    t0 = _t.perf_counter()
    float(generate2(frames2, jax.random.fold_in(key, 10_002))[0, 0, 0, 0])
    return _t.perf_counter() - t0


def _reference_style_baseline(jax, jnp, np, vt, vt_params, n_pixels, B,
                              n_prime, our_fps):
    """Measure the reference's execution model on the same chip: full
    decoder recompute per pixel, no cross-pixel KV reuse (reference
    vt.py:123-131); extrapolate to the full video.

    The pixel steps are chained DEVICE-SIDE through the real data
    dependency (pixel p's sampled codes are written into the slice that
    pixel p+1 decodes — exactly the reference recurrence), with ONE host
    read fencing the whole chain. The reference additionally pays a host
    dispatch per pixel, which this deliberately does NOT charge to it: on
    this rig a per-pixel host sync would bill the ~190 ms remote-tunnel
    RTT — not the microseconds a local torch host pays — inflating
    vs_baseline by tunnel latency instead of algorithm. The resulting
    ratio is therefore a conservative lower bound on the true speedup."""
    import time as _t

    from lvt_tpu.models.vt import _layer_norm, vt_decode, vt_encode, vt_sample_pixel_channels
    from lvt_tpu.ops import subscale as ss

    c = vt.c
    t, h, w = vt.plan.slice_shape
    thw = t * h * w
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.integers(0, c.nv, size=(B, c.nc, vt.T, vt.H, vt.W)),
                        jnp.int32)
    vflat = video.reshape(B, c.nc, -1)
    ctx = ss.gather_context(vflat, jnp.asarray(vt.plan.ctx_src[n_prime]), c.pad_value)
    sidx = jnp.full((B,), n_prime, jnp.int32)

    encode = jax.jit(lambda ctx: vt_encode(vt_params["netG"], c, ctx, sidx))
    zl = encode(ctx)
    zl.block_until_ready()

    def one_pixel(sl, zl, p, key):
        yl = vt_decode(vt_params["netG"], c, sl, zl)
        pred = vt_params["netG"]["predictor"]
        y = _layer_norm(yl.reshape(B, thw, c.d)[:, p], pred["ln_scale"], pred["ln_bias"])
        codes = vt_sample_pixel_channels(vt_params["netG"], c, y, key, 1.0)
        # write the sampled codes back: pixel p+1's decode depends on them,
        # so the chip serializes the chain (no fence needed per pixel)
        return sl.reshape(B, c.nc, thw).at[:, :, p].set(codes).reshape(sl.shape)

    one_pixel_j = jax.jit(one_pixel)
    sl0 = ss.gather_slice(vflat, jnp.asarray(vt.plan.slice_src[n_prime]))
    key = jax.random.key(3)
    int(one_pixel_j(sl0, zl, 0, key).reshape(-1)[0])  # compile + warmup

    t0 = _t.perf_counter()
    sl = sl0
    for p in range(n_pixels):
        sl = one_pixel_j(sl, zl, p, jax.random.fold_in(key, p))
    int(sl.reshape(-1)[0])  # one host read fences the dependent chain
    per_pixel = (_t.perf_counter() - t0) / n_pixels

    # full video: S_sampled slices x thw pixels (prime slices skipped)
    s_total = vt.plan.num_slices - n_prime  # DSFVT: fully-primed slices skipped
    ref_seconds = per_pixel * s_total * thw
    ref_fps = B * (vt.T - n_prime) / ref_seconds
    return our_fps / ref_fps


if __name__ == "__main__":
    main()
