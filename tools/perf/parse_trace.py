"""Aggregate device-op durations from a jax.profiler trace.

Usage: python tools/perf/parse_trace.py [/tmp/jax_trace] [n_steps]

Reads the newest plugins/profile/*/ *.trace.json.gz, sums duration events on
TPU device tracks by op name, and prints the top ops (total ms across the
traced region; divide by the number of traced steps for per-step cost).
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def newest_trace(root):
    cands = glob.glob(os.path.join(
        root, "plugins/profile/*/", "*.trace.json.gz"))
    if not cands:
        raise SystemExit(f"no trace under {root}")
    return max(cands, key=os.path.getmtime)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = newest_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]

    # device tracks: pid whose process name mentions TPU/device XLA ops
    proc_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in proc_names.items()
                if re.search(r"TPU|/device|XLA Ops", nm, re.I)}

    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            d = e.get("dur", 0) / 1e3  # us -> ms
            name = e.get("name", "?")
            durs[name] += d
            counts[name] += 1
            total += d
    print(f"trace: {path}")
    print(f"total device time: {total:.1f} ms over {n_steps} steps "
          f"= {total / n_steps:.1f} ms/step")
    print(f"{'ms/step':>8}  {'count':>6}  op")
    for name, d in durs.most_common(40):
        print(f"{d / n_steps:8.2f}  {counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
