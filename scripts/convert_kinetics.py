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
from concurrent.futures import ProcessPoolExecutor
from glob import glob
from shutil import rmtree

from PIL import Image


def process_video(path, output_dir, img_size):
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
    args = parser.parse_args()

    videos = sorted(glob(os.path.join(args.input_dir, "*", "*.mp4")))
    print(f"{len(videos)} videos")
    with ProcessPoolExecutor(args.jobs) as pool:
        futures = [pool.submit(process_video, v, args.output_dir, args.img_size)
                   for v in videos]
        total = sum(f.result() for f in futures)
    print(f"Done: {total} frames")


if __name__ == "__main__":
    main()
