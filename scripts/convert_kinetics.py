#!/usr/bin/env python
"""Convert Kinetics mp4s into per-video png frame trees
(reference: scripts/convert_kinetics.py).

For each <input_dir>/<class>/<video>.mp4: ffmpeg-extract frames, center-crop
square, LANCZOS-resize to --img_size, write
<output_dir>/<class>/<video>/<i>.png. Parallel over videos.
"""

import argparse
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor
from glob import glob
from shutil import rmtree

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_DEVICE_CHUNK = 64  # frames per device batch (bounds HBM/host memory)


def _device_crop_resize(frames, img_size):
    """Batched on-device center-crop + Lanczos resize of (N, H, W, 3) uint8.

    The jit-compiled equivalent of the per-frame PIL loop below
    (lvt_tpu.data.preprocess; reference scripts/convert_kinetics.py:41-47),
    chunked so arbitrarily long videos stay within device memory. Matches
    PIL within 1/255 at the Kinetics downscale (>=3.75x); see
    tests/test_preprocess.py for the small-scale-factor bound.
    """
    import jax

    from lvt_tpu.data.preprocess import center_crop_resize

    fn = jax.jit(lambda x: center_crop_resize(x, img_size))
    out = [np.asarray(fn(frames[i:i + _DEVICE_CHUNK]))
           for i in range(0, len(frames), _DEVICE_CHUNK)]
    return np.concatenate(out, axis=0)


def process_video(path, output_dir, img_size, preprocess="pil"):
    head, name = os.path.split(path)
    cls = os.path.basename(head)
    save_dir = os.path.join(output_dir, cls, name.split(".")[0])
    log_name = f"{cls}/{os.path.basename(save_dir)}"

    if os.path.exists(save_dir):
        rmtree(save_dir)
    os.makedirs(save_dir)

    cmd = f'ffmpeg -threads 1 -i "{path}" "{os.path.join(save_dir, "%d.png")}"'
    try:
        subprocess.check_output(cmd, shell=True, stderr=subprocess.STDOUT)
    except subprocess.CalledProcessError as e:
        print("Error while converting:", log_name, e.output[-200:])
        with open("fail_convert.log", "a") as f:
            f.write(path + "\n")
        return 0

    frames = glob(os.path.join(save_dir, "*.png"))
    if preprocess == "device":
        stack = np.stack([np.asarray(Image.open(f).convert("RGB"))
                          for f in frames], axis=0)
        out = _device_crop_resize(stack, img_size)
        for f, arr in zip(frames, out):
            Image.fromarray(arr).save(f)
    else:
        for frame in frames:
            img = Image.open(frame)
            width, height = img.size
            dim = min(width, height)
            left, top = (width - dim) / 2, (height - dim) / 2
            img = img.crop((left, top, left + dim, top + dim))
            img = img.resize((img_size, img_size), Image.LANCZOS)
            img.save(frame)
    print("Finished:", log_name, f"({len(frames)} frames)")
    return len(frames)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True,
                        help="directory of <class>/<video>.mp4 trees")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--img_size", type=int, default=64)
    parser.add_argument("--jobs", type=int, default=8)
    parser.add_argument("--preprocess", choices=["pil", "device"], default="pil",
                        help="'device' = batched on-device (jit) center-crop "
                             "+ Lanczos resize per video instead of the "
                             "per-frame host PIL loop; matches PIL within "
                             "1/255 at the Kinetics downscale")
    args = parser.parse_args()

    videos = sorted(glob(os.path.join(args.input_dir, "*", "*.mp4")))
    print(f"{len(videos)} videos")
    with ProcessPoolExecutor(args.jobs) as pool:
        futures = [pool.submit(process_video, v, args.output_dir, args.img_size,
                               args.preprocess)
                   for v in videos]
        total = sum(f.result() for f in futures)
    print(f"Done: {total} frames")


if __name__ == "__main__":
    main()
