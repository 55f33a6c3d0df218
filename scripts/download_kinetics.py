#!/usr/bin/env python
"""Download Kinetics video clips from YouTube and trim to the annotated
segment (reference: scripts/download_kinetics.py, from kinetics-downloader).

Requires `yt-dlp` (or `youtube-dl`) and `ffmpeg` on PATH; the CSV is the
official kinetics annotation file with columns
label,youtube_id,time_start,time_end,split.
"""

import argparse
import csv
import os
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor


def _downloader():
    for cand in ("yt-dlp", "youtube-dl"):
        if shutil.which(cand):
            return cand
    raise RuntimeError("Install yt-dlp or youtube-dl to download Kinetics")


def download_clip(row, output_dir, tool):
    label = row["label"].strip().replace(" ", "_")
    yid = row["youtube_id"]
    start = float(row["time_start"])
    end = float(row["time_end"])
    out_dir = os.path.join(output_dir, label)
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, f"{yid}_{int(start):06d}_{int(end):06d}.mp4")
    if os.path.exists(final):
        return "exists"

    tmp = final + ".full.mp4"
    try:
        subprocess.check_output(
            [tool, "-f", "mp4", "-o", tmp, f"https://youtu.be/{yid}"],
            stderr=subprocess.STDOUT, timeout=600)
        subprocess.check_output(
            ["ffmpeg", "-y", "-i", tmp, "-ss", str(start), "-to", str(end),
             "-c", "copy", final],
            stderr=subprocess.STDOUT, timeout=600)
        return "ok"
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        return f"fail: {e}"
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--csv", required=True, help="kinetics annotation csv")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--jobs", type=int, default=8)
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    tool = _downloader()
    with open(args.csv) as f:
        rows = list(csv.DictReader(f))
    if args.limit:
        rows = rows[: args.limit]
    print(f"{len(rows)} clips")
    with ThreadPoolExecutor(args.jobs) as pool:
        results = list(pool.map(
            lambda r: download_clip(r, args.output_dir, tool), rows))
    ok = sum(1 for r in results if r in ("ok", "exists"))
    print(f"done: {ok}/{len(rows)} clips")


if __name__ == "__main__":
    main()
