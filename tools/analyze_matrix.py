#!/usr/bin/env python
"""Summarize a tools/measure_decode_matrix.sh log into a markdown table.

The matrix log interleaves `=== HH:MM:SS <cmd>` markers, each bench's one
JSON result line, and `=== rc=N <cmd>` exit markers. This pairs them up and
prints one row per run (fps, median seconds, knobs, rc), flagging runs that
produced no JSON (crash/timeout) so a failed config is impossible to miss
when updating BASELINE.md after a measurement session.

Usage: python tools/analyze_matrix.py [/tmp/measure_matrix.log]
"""

import json
import re
import sys


def parse(path):
    runs = []
    cur = None  # {"cmd", "start", "json", "rc", "stderr_tail"}
    start_re = re.compile(r"^=== (\d\d:\d\d:\d\d) (.*)$")
    rc_re = re.compile(r"^=== rc=(\d+) (.*)$")
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            m = rc_re.match(line)
            if m:
                if cur is not None and cur["cmd"] == m.group(2):
                    cur["rc"] = int(m.group(1))
                    runs.append(cur)
                    cur = None
                continue
            m = start_re.match(line)
            if m:
                if cur is not None:  # previous run never printed rc
                    runs.append(cur)
                cur = {"cmd": m.group(2), "start": m.group(1), "json": None,
                       "rc": None, "tail": []}
                continue
            if cur is None:
                continue
            if line.startswith("{") and ('"metric"' in line
                                         or '"frames_per_sec_per_chip"' in line):
                try:
                    cur["json"] = json.loads(line)
                except ValueError:
                    pass
            else:
                cur["tail"].append(line)
                cur["tail"] = cur["tail"][-3:]
    if cur is not None:
        runs.append(cur)
    return runs


def short_cmd(cmd):
    # drop the interpreter + script prefix, keep the flags that matter
    cmd = re.sub(r"^(timeout \d+ )?python ", "", cmd)
    cmd = cmd.replace("tools/bench_sample.py", "bench_sample")
    cmd = cmd.replace("bench.py", "bench")
    cmd = cmd.replace("--config configs/vt/", "")
    cmd = cmd.replace(" --skip-baseline", "")
    return cmd


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/measure_matrix.log"
    runs = parse(path)
    if not runs:
        print(f"no runs found in {path}")
        return 1
    print("| run | fps | median s | min..max s | detail | rc |")
    print("|---|---|---|---|---|---|")
    bad = 0
    for r in runs:
        j = r["json"]
        if j is None:
            bad += 1
            tail = "; ".join(r["tail"])[-120:]
            print(f"| {short_cmd(r['cmd'])} | **NO JSON** | — | — | "
                  f"{tail} | {r['rc']} |")
            continue
        # bench.py nests knobs under "detail"; bench_sample.py is flat
        d = j.get("detail", j)
        fps = j.get("value", d.get("frames_per_sec_per_chip"))
        med = d.get("gen_seconds_median", d.get("seconds_median"))
        lo = d.get("gen_seconds_min", d.get("seconds_min"))
        hi = d.get("gen_seconds_max", d.get("seconds_max"))
        knobs = ", ".join(
            f"{k}={d[k]}" for k in ("batch", "kv_cache", "kv", "weights",
                                    "attn", "mm", "seg")
            if d.get(k) not in (None, "native", "xla"))
        print(f"| {short_cmd(r['cmd'])} | {fps} | {med} | "
              f"{lo}..{hi} | {knobs} | {r['rc']} |")
    n_ok = len(runs) - bad
    print(f"\n{n_ok}/{len(runs)} runs produced JSON"
          + (f"  ({bad} FAILED — inspect the log)" if bad else ""))
    return 0 if bad == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
