"""Per-source SELF-time breakdown of a jax.profiler device trace.

Usage: python tools/perf/source_buckets.py /tmp/trace_dir n_steps [top_lines]

Device traces nest wrapper spans (cond/while/scan bodies, the jit_train_step
umbrella) around the leaf fusions, so naive summing double-counts. This
computes true self-time per span (duration minus in-track children, via a
start-sorted stack sweep) and buckets it by the `source` arg (file:line).
"""
import collections
import glob
import gzip
import json
import os
import sys


def newest_trace(root):
    cands = glob.glob(os.path.join(
        root, "plugins/profile/*/", "*.trace.json.gz"))
    if not cands:
        raise SystemExit(f"no trace under {root}")
    return max(cands, key=os.path.getmtime)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    top_lines = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    path = newest_trace(root)
    with gzip.open(path, "rt") as f:
        ev = json.load(f)["traceEvents"]

    # only the "XLA Ops" thread carries leaf ops; the "Steps" and "XLA
    # Modules" threads duplicate the whole step as one span each (the
    # round-4 "<no source> 880 ms" was exactly this double count)
    op_tids = set()
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"):
            op_tids.add((e.get("pid"), e.get("tid")))

    tracks = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") != "X":
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        a = e.get("args") or {}
        d = a.get("device_duration_ps")
        if d is None:
            continue
        t0 = int(a.get("device_offset_ps", 0))
        src = a.get("source", "<no source>")
        src = src.replace("/root/repo/openpcseg_tpu/", "")
        src = src.replace("/opt/venv/lib/python3.12/site-packages/", "")
        tracks[(e.get("pid"), e.get("tid"))].append(
            (t0, t0 + int(d), src, e.get("name", "")))

    by_line = collections.Counter()
    by_file = collections.Counter()
    name_for = {}
    total = 0.0

    def emit(src, name, self_ps):
        nonlocal total
        ms = self_ps / 1e9 / n_steps
        if ms <= 0:
            return
        total += ms
        by_line[src] += ms
        name_for.setdefault(src, name)
        by_file[src.split(":")[0]] += ms

    for spans in tracks.values():
        spans.sort(key=lambda s: (s[0], -s[1]))
        stack = []  # open ancestors: [end, childsum_ps, src, name, dur_ps]
        for t0, t1, src, name in spans:
            while stack and t0 >= stack[-1][0]:
                end, childsum, psrc, pname, pdur = stack.pop()
                emit(psrc, pname, pdur - childsum)
                if stack:
                    stack[-1][1] += pdur
            stack.append([t1, 0, src, name, t1 - t0])
        while stack:
            end, childsum, psrc, pname, pdur = stack.pop()
            emit(psrc, pname, pdur - childsum)
            if stack:
                stack[-1][1] += pdur

    print(f"trace: {path}\nself-time total: {total:.1f} ms/step "
          f"(over {n_steps} steps)\n")
    print("== by file ==")
    for f_, ms in by_file.most_common(20):
        print(f"{ms:8.2f}  {f_}")
    print(f"\n== top {top_lines} lines ==")
    for s, ms in by_line.most_common(top_lines):
        print(f"{ms:8.2f}  {s:42s}  e.g. {name_for[s][:40]}")


if __name__ == "__main__":
    main()
