"""Automated device-trace summary (SURVEY.md §5 tracing).

Parses the Chrome-trace JSON that ``jax.profiler`` writes (the same data
TensorBoard's profile plugin shows) and aggregates device-op time by HLO
category, by source line, and by op — the analysis PERF.md's tables were
originally produced from by hand.

Usage::

    python -m ddnerf_tpu.utils.trace_summary LOGDIR --steps N [--top K]

``LOGDIR`` is a directory passed to ``utils.profiling.trace`` (or the train
CLI's ``--profile-steps``); the newest ``*.trace.json.gz`` under
``plugins/profile`` is used.  ``--steps`` divides totals into per-step
numbers.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Optional


def find_latest_trace(logdir: str) -> Optional[str]:
    paths = glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    return max(paths, key=os.path.getmtime) if paths else None


def _exclusive_durations(ops: List[dict]) -> None:
    """Annotate each event with ``_excl``: its duration minus any nested
    child events on the same track.

    Control-flow wrapper ops (``while``, ``conditional``) appear on the
    XLA-Ops track as events that SPAN their body's ops — counting their raw
    duration double-counts everything inside (a ``while.N`` row once read as
    47% of the step).  Chrome-trace 'X' events nest by containment: sort by
    (ts, -dur) and subtract each child from its immediate parent.
    """
    by_track: Dict[tuple, List[dict]] = collections.defaultdict(list)
    for e in ops:
        by_track[(e["pid"], e["tid"])].append(e)
    for track in by_track.values():
        track.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack: List[dict] = []
        for e in track:
            e["_excl"] = e["dur"]
            while stack and e["ts"] >= stack[-1]["ts"] + stack[-1]["dur"]:
                stack.pop()
            if stack:
                stack[-1]["_excl"] -= e["dur"]
            stack.append(e)


def load_device_ops(trace_path: str) -> List[dict]:
    """All complete ('X') events on the device's XLA-Ops track, with their
    args (hlo_category / source / tf_op / flops / bytes).  Each event is
    annotated with ``_excl`` (self time: duration minus nested children) —
    the aggregations use it so control-flow wrappers don't double-count."""
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "CPU" not in e["args"]["name"]
    }
    ops_tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["args"]["name"] == "XLA Ops"
    }
    ops = [
        e
        for e in events
        if e.get("ph") == "X"
        and e["pid"] in device_pids
        and (e["pid"], e["tid"]) in ops_tids
        and e.get("args")
    ]
    _exclusive_durations(ops)
    return ops


def summarize(ops: List[dict], steps: int = 1) -> Dict[str, object]:
    """Aggregate op durations.  Returns a dict with ``total_ms`` (per step),
    ``by_category``, ``by_source``, ``by_op`` — each a list of
    (key, ms_per_step, share) sorted by time — and ``model_flops``."""
    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_op = collections.Counter()
    flops = 0
    for e in ops:
        a = e["args"]
        dur = e.get("_excl", e["dur"])
        by_cat[a.get("hlo_category", "?")] += dur
        by_src[a.get("source", "(unattributed)")] += dur
        by_op[a.get("deduplicated_name") or e["name"]] += dur
        flops += int(a.get("model_flops", 0) or 0)
    total = sum(by_cat.values())

    def table(counter):
        return [
            (k, v / steps / 1000.0, v / total if total else 0.0)
            for k, v in counter.most_common()
        ]

    return {
        "total_ms": total / steps / 1000.0,
        "model_gflops": flops / steps / 1e9,
        "by_category": table(by_cat),
        "by_source": table(by_src),
        "by_op": table(by_op),
    }


def format_summary(summary: Dict[str, object], top: int = 15) -> str:
    lines = [
        f"device op time: {summary['total_ms']:.3f} ms/step   "
        f"model flops: {summary['model_gflops']:.1f} G/step",
        "",
        "-- by HLO category --",
    ]
    for key, ms, share in summary["by_category"][:top]:
        lines.append(f"{ms:9.4f} ms  {100 * share:5.1f}%  {key}")
    lines += ["", "-- by source line --"]
    for key, ms, share in summary["by_source"][:top]:
        lines.append(f"{ms:9.4f} ms  {100 * share:5.1f}%  {key}")
    lines += ["", "-- by op --"]
    for key, ms, share in summary["by_op"][:top]:
        lines.append(f"{ms:9.4f} ms  {100 * share:5.1f}%  {key}")
    return "\n".join(lines)


def summarize_logdir(logdir: str, steps: int = 1, top: int = 15) -> str:
    trace = find_latest_trace(logdir)
    if trace is None:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}/plugins/profile")
    return format_summary(summarize(load_device_ops(trace), steps), top)


def roofline(ops: List[dict], steps: int = 1, top: int = 20,
             min_ms: float = 0.01) -> str:
    """Per-op roofline table: achieved TFLOP/s and GB/s from the trace's own
    ``model_flops`` / ``bytes_accessed`` args.  An op near the HBM-bandwidth
    peak (or, for matmuls, the MXU peak) is at its hardware floor — time
    spent there is provably not recoverable by fusion/layout work.  Ops well
    below BOTH peaks are the remaining optimization surface (kernel-launch
    shaped, VPU-serial, or padding-wasted).
    """
    agg: Dict[str, List[float]] = {}
    for e in ops:
        a = e["args"]
        key = a.get("deduplicated_name") or e["name"]
        d = agg.setdefault(key, [0.0, 0.0, 0.0, 0])
        d[0] += e.get("_excl", e["dur"])                  # us (self time)
        d[1] += float(a.get("model_flops", 0) or 0)
        d[2] += float(a.get("bytes_accessed", 0) or 0)
        d[3] += 1
        if len(d) == 4:  # first sighting: keep a representative cat/source
            d.extend([a.get("hlo_category", "?"), a.get("source", "?")])
    rows = []
    for key, d in agg.items():
        us, fl, by = d[0], d[1], d[2]
        ms = us / steps / 1000.0
        if ms < min_ms:
            continue
        tfs = fl / (us * 1e-6) / 1e12 if us else 0.0
        gbs = by / (us * 1e-6) / 1e9 if us else 0.0
        rows.append((ms, tfs, gbs, key, d[4], d[5]))
    rows.sort(reverse=True)
    lines = [
        "-- roofline (per deduplicated op; achieved vs chip peaks) --",
        f"{'ms/step':>8} {'TF/s':>7} {'GB/s':>7}  op  [category]  source",
    ]
    for ms, tfs, gbs, key, cat, src in rows[:top]:
        src = src.split("/")[-1] if src else "?"
        lines.append(
            f"{ms:8.4f} {tfs:7.1f} {gbs:7.1f}  {key}  [{cat}]  {src}"
        )
    tot_ms = sum(r[0] for r in rows)
    lines.append(f"(rows >= {min_ms} ms: {len(rows)}, {tot_ms:.3f} ms/step)")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=1,
                    help="profiled steps (divides totals into per-step)")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--roofline", action="store_true",
                    help="per-op achieved TFLOP/s + GB/s table")
    args = ap.parse_args(argv)
    if args.roofline:
        trace = find_latest_trace(args.logdir)
        if trace is None:
            raise FileNotFoundError(
                f"no trace.json.gz under {args.logdir}/plugins/profile")
        print(roofline(load_device_ops(trace), args.steps, args.top))
    else:
        print(summarize_logdir(args.logdir, args.steps, args.top))


if __name__ == "__main__":
    main()
