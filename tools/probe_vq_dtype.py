#!/usr/bin/env python
"""Price the VQ-VAE-ends dtype lever for bench.py's headline pipeline.

bench.py casts only the VT sampler's weights to bf16; the VQ-VAE encode of
the priming frames and the decode of the sampled codes run in fp32 (the r3
breakdown measured them at ~5% of the b256 end-to-end time; at b1024 that
is ~0.7 s of 13.3 s). This probe times encode (B*n_prime frames) and
decode (B*T code grids) at the headline batch in fp32 vs bf16 params on
the real chip, host-read fenced, and reports:

  - per-pass medians and the projected headline fps delta,
  - encode CODE AGREEMENT fp32 vs bf16 (the north-star target is
    bit-matched codebook indices from the encoder — if bf16 flips codes,
    the encode side must stay fp32 regardless of speed).

Run on the TPU (no JAX_PLATFORMS override); ~2 min.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fence(out):
    """Host-read fence by scalar indexing (NO reshape: a device reshape of
    the (…, 3)-minor-dim frame output forces a T(8,128) padded-layout copy —
    3 lanes pad to 128, a 42x blowup that OOMs HBM at this batch)."""
    return float(out[(0,) * out.ndim].astype("float32"))


def _timed(fn, *args, reps=5):
    """Median wall time of fn(*args), each rep fenced by a host read."""
    _fence(fn(*args))  # compile + warmup
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _fence(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lvt_tpu.config import get_cfg
    from lvt_tpu.models import cast_floats
    from lvt_tpu.models.vqvae import VQVAE

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vq_cfg = get_cfg()
    vq_cfg.merge_from_file(os.path.join(root, "configs", "vqvae",
                                        "PR-DVQVAE2.yaml"))
    vq = VQVAE(vq_cfg)
    params, state = vq.init(jax.random.key(1))
    params_bf = cast_floats(params, jnp.bfloat16)
    state_bf = cast_floats(state, jnp.bfloat16)

    B, T, n_prime = args.batch, 16, 5
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.random((B * n_prime, 64, 64, 3)).astype(np.float32))
    codes = jax.device_put(
        rng.integers(0, vq.K, size=(B * T, 16, 16, vq.num)).astype(np.int32))
    frames.block_until_ready()
    codes.block_until_ready()

    @jax.jit
    def enc_f32(x):
        return vq.encode(params, state, vq.normalize(x))

    @jax.jit
    def enc_bf16(x):
        return vq.encode(params_bf, state_bf,
                         vq.normalize(x).astype(jnp.bfloat16))

    @jax.jit
    def dec_f32(idx):
        return jnp.clip(vq.denormalize(
            vq.decode(params, state, idx)), 0.0, 1.0)

    @jax.jit
    def dec_bf16(idx):
        return jnp.clip(vq.denormalize(
            vq.decode(params_bf, state_bf, idx).astype(jnp.float32)), 0.0, 1.0)

    print(f"batch {B} (encode {B * n_prime} frames, decode {B * T} grids), "
          f"reps {args.reps}, backend {jax.default_backend()}", flush=True)
    enc32_med, enc32 = _timed(enc_f32, frames, reps=args.reps)
    print(f"encode fp32 : {enc32_med:.4f} s  {enc32}", flush=True)
    enc16_med, enc16 = _timed(enc_bf16, frames, reps=args.reps)
    print(f"encode bf16 : {enc16_med:.4f} s  {enc16}", flush=True)
    dec32_med, dec32 = _timed(dec_f32, codes, reps=args.reps)
    print(f"decode fp32 : {dec32_med:.4f} s  {dec32}", flush=True)
    dec16_med, dec16 = _timed(dec_bf16, codes, reps=args.reps)
    print(f"decode bf16 : {dec16_med:.4f} s  {dec16}", flush=True)

    # north-star check: does bf16 flip encoder code indices?
    c32 = np.asarray(enc_f32(frames))
    c16 = np.asarray(enc_bf16(frames))
    agree = float((c32 == c16).mean())
    print(f"encode code agreement fp32 vs bf16: {agree:.6f}")
    saved = (enc32_med - enc16_med) + (dec32_med - dec16_med)
    anchor = 13.291  # r5 same-session DSFVT b1024 anchor (AB_r5_levers.jsonl)
    print(f"total VQ-VAE ends fp32: {enc32_med + dec32_med:.4f} s "
          f"({100 * (enc32_med + dec32_med) / anchor:.1f}% of the 13.291 s "
          f"headline); bf16 saves {saved:.4f} s -> projected headline "
          f"{B * (T - n_prime) / (anchor - saved):.1f} fps vs "
          f"{B * (T - n_prime) / anchor:.1f}")


if __name__ == "__main__":
    main()
