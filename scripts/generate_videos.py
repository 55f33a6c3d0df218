#!/usr/bin/env python
"""End-to-end video generation from priming frames
(reference: scripts/generate_videos.py).

Pipeline: load priming pngs -> VQ-VAE encode to latent codes -> zero-pad to
16 frames -> jitted subscale AR sampling -> VQ-VAE decode -> save pngs.
Unlike the reference's per-pixel Python loop with a device sync per step, the
entire encode -> rollout -> decode path here is jit-compiled (one dispatch).

Usage:
  python scripts/generate_videos.py --config-file configs/vt/DSFVT.yaml \
      --video-dir example/ [OUTPUT_DIR out] [opts...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Sample a 16-frame video given priming frames")
    parser.add_argument("--config-file", required=True, metavar="FILE")
    parser.add_argument("--video-dir", required=True,
                        help="folder with priming frame pngs")
    parser.add_argument("--img-size", type=int, default=0,
                        help="if >0, center-crop + Lanczos-resize the priming "
                             "frames to this size ON DEVICE inside the jitted "
                             "encode (lvt_tpu.data.preprocess); 0 = use the "
                             "frames as loaded")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args()


def load_priming_frames(video_dir, n_prime):
    from lvt_tpu.utils.image import get_image_paths, read_image

    paths = [x["image_path"] for x in get_image_paths(video_dir, use_cache=False)]
    if len(paths) < n_prime:
        raise SystemExit(
            f"--video-dir {video_dir!r} holds {len(paths)} image(s); "
            f"need at least TEST.VT_SAMPLER.N_PRIME={n_prime} priming frames")
    frames = np.stack([read_image(p, "RGB") for p in paths[:n_prime]], axis=0)
    return frames.astype(np.float32)  # (n_prime, H, W, 3)


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from lvt_tpu.config import get_cfg
    from lvt_tpu.engine.defaults import default_setup
    from lvt_tpu.evaluation.vt_sampler import load_paired_vqvae
    from lvt_tpu.models.vt import VideoTransformer
    from lvt_tpu.utils.image import save_image

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    default_setup(cfg, args)

    n_prime = cfg.TEST.VT_SAMPLER.N_PRIME
    total_frames = cfg.INPUT.N_FRAMES_PER_VIDEO_TEST
    assert total_frames > 0

    # --- stage 0: VQ-VAE + priming frames (encode once, eagerly, to learn
    # the latent grid size — the VT geometry is derived from it, not assumed)
    vqvae, vq_params, vq_state, vq_cfg = load_paired_vqvae(cfg)
    scale01 = vq_cfg.INPUT.SCALE_TO_ZEROONE

    frames = load_priming_frames(args.video_dir, n_prime)
    if scale01:
        frames = frames / 255.0
    print(f"Loaded {len(frames)} priming frames")

    def encode_priming(f):
        if args.img_size > 0:
            from lvt_tpu.data.preprocess import center_crop_resize

            f = center_crop_resize(f, args.img_size)  # on-device, same jit
        return jnp.transpose(
            vqvae.encode(vq_params, vq_state, vqvae.normalize(f)),
            (3, 0, 1, 2))

    codes = jax.jit(encode_priming)(jnp.asarray(frames))  # (nc, n_prime, h, w)
    nc, _, h, w = codes.shape

    # --- stage 1: VT model + weights on the measured (T, h, w) geometry
    vt = VideoTransformer(cfg, T=total_frames, H=h, W=w)
    vt_params, _ = vt.init(jax.random.key(0))
    gen_w = cfg.MODEL.GENERATOR.WEIGHTS
    if gen_w and os.path.exists(gen_w):
        if gen_w.endswith(".pth"):
            from lvt_tpu.checkpoint.torch_convert import (
                convert_video_transformer,
                load_torch_state_dict,
            )

            vt_params = {"netG": convert_video_transformer(
                load_torch_state_dict(gen_w), vt.c)}
        else:
            from lvt_tpu.checkpoint import load_checkpoint

            tree = load_checkpoint(gen_w, {"params": vt_params}, partial=True)
            vt_params = tree["params"]
    else:
        from lvt_tpu.checkpoint import latest_checkpoint, load_checkpoint

        ckpt = latest_checkpoint(cfg.OUTPUT_DIR)
        if ckpt:
            tree = load_checkpoint(ckpt, {"params": vt_params}, partial=True)
            vt_params = tree["params"]
        else:
            print("WARNING: no VT weights found; sampling with random init")

    # --- stage 2: jitted rollout + decode (one dispatch)
    @jax.jit
    def generate(codes, key):
        video = jnp.zeros((1, nc, total_frames, h, w), jnp.int32)
        video = video.at[0, :, :n_prime].set(codes)
        sampled = vt.sample_video(
            vt_params, video, key, n_prime=n_prime,
            kv_cache_dtype=cfg.TEST.VT_SAMPLER.KV_DTYPE,
            kv_seg_size=cfg.TEST.VT_SAMPLER.SEG,
            attn_impl=cfg.TEST.VT_SAMPLER.ATTN_IMPL,
            weight_dtype=getattr(cfg.TEST.VT_SAMPLER, "WEIGHT_DTYPE",
                                 "native"))[0]
        # decode all frames
        idx = jnp.transpose(sampled, (1, 2, 3, 0))  # (T, h, w, nc)
        out = vqvae.decode(vq_params, vq_state, idx)  # (T, H, W, 3)
        out = vqvae.denormalize(out)
        if scale01:
            out = out * 255.0
        return jnp.clip(out, 0.0, 255.0)

    video = np.asarray(generate(codes, jax.random.key(args.seed))).astype(np.uint8)
    print("Sampled new video.")

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    for i, frame in enumerate(video):
        save_image(frame, os.path.join(cfg.OUTPUT_DIR, f"{i}.png"))
    print(f"Saved {len(video)} frames to {cfg.OUTPUT_DIR}")


if __name__ == "__main__":
    main()
