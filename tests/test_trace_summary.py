"""Trace-summary tool: aggregation over a synthetic Chrome trace, plus a
round-trip through a real jax.profiler capture on CPU."""

import gzip
import json
import os

import jax
import jax.numpy as jnp
import pytest

from ddnerf_tpu.utils import trace_summary as ts


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_summarize_synthetic_trace(tmp_path):
    trace = str(tmp_path / "plugins" / "profile" / "run1" / "host.trace.json.gz")
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        # two steps of: one matmul fusion + one copy on the ops track
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "ts": 0, "dur": 3000,
         "args": {"hlo_category": "convolution fusion",
                  "source": "/repo/mlp.py:55", "model_flops": "1000000"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "ts": 3000, "dur": 1000,
         "args": {"hlo_category": "copy"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "ts": 9000, "dur": 3000,
         "args": {"hlo_category": "convolution fusion",
                  "source": "/repo/mlp.py:55", "model_flops": "1000000"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.1", "ts": 12000, "dur": 1000,
         "args": {"hlo_category": "copy"}},
        # same names on the Steps track / host pid must be ignored
        {"ph": "X", "pid": 3, "tid": 1, "name": "step", "ts": 0, "dur": 99999,
         "args": {"hlo_category": "bogus"}},
        {"ph": "X", "pid": 9, "tid": 3, "name": "hostwork", "ts": 0, "dur": 99999,
         "args": {"hlo_category": "bogus"}},
    ]
    _write_trace(trace, events)

    assert ts.find_latest_trace(str(tmp_path)) == trace
    ops = ts.load_device_ops(trace)
    assert len(ops) == 4
    s = ts.summarize(ops, steps=2)
    assert s["total_ms"] == pytest.approx(4.0)  # (3000+1000)*2 us / 2 steps
    cats = dict((k, ms) for k, ms, _ in s["by_category"])
    assert cats["convolution fusion"] == pytest.approx(3.0)
    assert cats["copy"] == pytest.approx(1.0)
    assert s["model_gflops"] == pytest.approx(1e-3)
    text = ts.format_summary(s)
    assert "convolution fusion" in text and "mlp.py:55" in text


def test_real_cpu_capture_parses_without_ops(tmp_path):
    """The CPU backend emits no per-op XLA-Ops track (the tool's tables are
    TPU data); a genuine CPU capture must still parse and summarize to empty
    tables instead of crashing — the train CLI calls this unconditionally
    after --profile-steps."""
    logdir = str(tmp_path)

    @jax.jit
    def f(x):
        return (x @ x.T).sum()

    x = jnp.ones((64, 64))
    float(f(x))
    jax.profiler.start_trace(logdir)
    float(f(x))
    jax.profiler.stop_trace()

    trace = ts.find_latest_trace(logdir)
    assert trace is not None
    assert ts.load_device_ops(trace) == []
    out = ts.summarize_logdir(logdir, steps=1)
    assert "device op time: 0.000" in out


def test_roofline_synthetic_trace(tmp_path):
    """Roofline table: achieved TF/s and GB/s derive from the trace's own
    model_flops / bytes_accessed args; sub-threshold ops are dropped."""
    trace = str(tmp_path / "plugins" / "profile" / "r" / "host.trace.json.gz")
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # 1 ms, 100 GFLOP, 200 MB -> 100 TF/s, 200 GB/s
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.9", "ts": 0,
         "dur": 1000,
         "args": {"hlo_category": "convolution fusion",
                  "source": "/repo/mlp.py:1",
                  "model_flops": str(100 * 10**9),
                  "bytes_accessed": str(200 * 10**6)}},
        # below the 0.01 ms cutoff: must not appear
        {"ph": "X", "pid": 3, "tid": 3, "name": "tiny.1", "ts": 2000, "dur": 1,
         "args": {"hlo_category": "copy", "model_flops": "0",
                  "bytes_accessed": "10"}},
    ]
    _write_trace(trace, events)
    out = ts.roofline(ts.load_device_ops(trace), steps=1)
    assert "fusion.9" in out and "tiny.1" not in out
    line = next(l for l in out.splitlines() if "fusion.9" in l)
    cols = line.split()
    assert float(cols[0]) == pytest.approx(1.0)    # ms/step
    assert float(cols[1]) == pytest.approx(100.0)  # TF/s
    assert float(cols[2]) == pytest.approx(200.0)  # GB/s


def test_exclusive_durations_subtract_nested_children():
    """A while-wrapper spanning its body must only report self time."""
    from ddnerf_tpu.utils.trace_summary import _exclusive_durations

    ops = [
        {"pid": 1, "tid": 2, "ts": 0, "dur": 100,
         "args": {"hlo_category": "while"}, "name": "while.1", "ph": "X"},
        {"pid": 1, "tid": 2, "ts": 10, "dur": 30,
         "args": {"hlo_category": "fusion"}, "name": "fusion.1", "ph": "X"},
        {"pid": 1, "tid": 2, "ts": 50, "dur": 40,
         "args": {"hlo_category": "custom-call"}, "name": "cc.1", "ph": "X"},
        # sibling after the while on the same track
        {"pid": 1, "tid": 2, "ts": 120, "dur": 10,
         "args": {"hlo_category": "copy"}, "name": "copy.1", "ph": "X"},
        # grandchild: nested inside fusion.1, subtracts from fusion only
        {"pid": 1, "tid": 2, "ts": 12, "dur": 5,
         "args": {"hlo_category": "fusion"}, "name": "sub.1", "ph": "X"},
    ]
    _exclusive_durations(ops)
    excl = {e["name"]: e["_excl"] for e in ops}
    assert excl["while.1"] == 100 - 30 - 40
    assert excl["fusion.1"] == 30 - 5
    assert excl["cc.1"] == 40
    assert excl["copy.1"] == 10
    assert excl["sub.1"] == 5
