#!/usr/bin/env python
"""Aggregate device-op time from a jax.profiler trace directory.

Usage: python scripts/trace_anatomy.py /path/to/profile_dir [top_n]

Reads the perfetto trace (plugins/profile/*/*.trace.json.gz) written by
`jax.profiler.start_trace` (bench.py's BENCH_PROFILE_DIR), keeps complete
events on device-side tracks (TPU/device lanes, not the python host
threads), groups them by a normalized op name (fusion indices stripped),
and prints total/mean duration per group plus a category rollup — the
same op-anatomy methodology behind BENCHLOG's step breakdowns
(previously done ad hoc; SURVEY.md §5.1).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(profile_dir: str) -> dict:
    pats = [
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json"),
    ]
    paths = [p for pat in pats for p in glob.glob(pat, recursive=True)]
    if not paths:
        raise SystemExit(f"no trace.json(.gz) under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)


_NORM = re.compile(r"\.\d+$")


def _category(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "custom-call" in n and "mosaic" in n:
        return "pallas"
    if n.startswith("%fusion") or n.startswith("fusion"):
        return "fusion"
    if "conv" in n:
        return "conv"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "sort" in n or "top-k" in n or "topk" in n:
        return "sort/topk"
    if "reduce" in n:
        return "reduce"
    if "dot" in n or "gemm" in n or "matmul" in n:
        return "matmul"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter"
    if "all-reduce" in n or "collective" in n or "permute" in n:
        return "collective"
    return "other"


def main():
    profile_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace = load_trace(profile_dir)
    events = trace.get("traceEvents", [])

    # identify device-track pids: process names containing TPU / device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {
        pid
        for pid, name in pid_names.items()
        if any(k in name for k in ("TPU", "/device", "Device", "XLA Op"))
    }
    if not device_pids:  # fall back: every pid that has X (complete) events
        device_pids = set(pid_names)

    groups = collections.defaultdict(lambda: [0.0, 0])
    cats = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower():  # step-marker lanes double-count ops
            continue
        dur = float(e.get("dur", 0.0)) / 1e3  # us -> ms
        name = _NORM.sub("", e.get("name", "?"))
        groups[name][0] += dur
        groups[name][1] += 1
        cats[_category(name)] += dur
        total += dur

    print(f"device tracks: {sorted(pid_names[p] for p in device_pids)}")
    print(f"total device-op time: {total:.2f} ms (all steps in window)\n")
    print(f"{'ms':>10}  {'%':>5}  {'n':>5}  op")
    for name, (dur, n) in sorted(
        groups.items(), key=lambda kv: -kv[1][0]
    )[:top_n]:
        print(f"{dur:10.2f}  {100 * dur / max(total, 1e-9):5.1f}  {n:5d}  {name[:90]}")
    print("\ncategory rollup:")
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{dur:10.2f}  {100 * dur / max(total, 1e-9):5.1f}  {cat}")


if __name__ == "__main__":
    main()
