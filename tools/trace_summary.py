#!/usr/bin/env python
"""Summarize a jax.profiler chrome trace: per-op self-time on the device.

Usage:
  python tools/trace_summary.py /tmp/jaxtrace [--top 30] [--like scan]

Finds the newest plugins/profile/*/​*.trace.json.gz under the given dir,
keeps device-lane complete events ('X'), subtracts nested child time by
timestamp containment (the XLA rows nest, e.g. checkpoint >
rematted_computation — NOTES_r3.md), and prints self-time per op name,
grouped by the name with trailing `.N` indices stripped.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_lane_pids(events):
    """pids whose process name mentions TPU/device XLA lanes."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    return {pid for pid, n in names.items()
            if "TPU" in n or "/device:" in n or "XLA Op" in n}


def self_times(events, pids):
    """(name, dur, self_dur) per complete event on the device lanes, with
    child time removed by per-thread timestamp containment."""
    rows = [e for e in events
            if e.get("ph") == "X" and e.get("pid") in pids
            and "ts" in e and "dur" in e]
    out = []
    bythread = collections.defaultdict(list)
    for e in rows:
        bythread[(e["pid"], e.get("tid"))].append(e)
    for evs in bythread.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        child = collections.defaultdict(float)
        for e in evs:
            while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"]:
                done = stack.pop()
                out.append((done["name"], done["dur"],
                            done["dur"] - child.pop(id(done), 0.0)))
            if stack:
                child[id(stack[-1])] += e["dur"]
            stack.append(e)
        while stack:
            done = stack.pop()
            out.append((done["name"], done["dur"],
                        done["dur"] - child.pop(id(done), 0.0)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--like", default="", help="only ops whose name matches")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    pids = device_lane_pids(events)
    if not pids:
        sys.exit("no device lanes found (is this a device trace?)")
    rows = self_times(events, pids)

    strip = re.compile(r"\.\d+$")
    agg = collections.defaultdict(lambda: [0.0, 0])  # us, count
    total = 0.0
    for name, dur, self_dur in rows:
        key = strip.sub("", name)
        if args.like and args.like not in key:
            continue
        agg[key][0] += self_dur
        agg[key][1] += 1
        total += self_dur
    print(f"{'self ms':>10} {'count':>7}  op")
    for key, (us, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]:
        print(f"{us / 1000:>10.3f} {n:>7}  {key}")
    print(f"{total / 1000:>10.3f} {'':>7}  TOTAL (self, device lanes)")


if __name__ == "__main__":
    main()
