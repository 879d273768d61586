"""Unit tests for tools/profile_step.py's perfetto-trace parsing.

The tool backs ARCHITECTURE.md's device-busy attribution (e.g. the
12.3 ms flagship step split), so the lane-filtering logic — keep only the
device's "XLA Ops" lane, not the Steps/XLA Modules wrapper lanes that
triple-count device time — is worth pinning. The reference has no
profiling subsystem at all (SURVEY.md §5).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from profile_step import _op_family, device_op_table  # noqa: E402


def _meta(pid, tid, proc, thread):
    out = [{"ph": "M", "name": "process_name", "pid": pid,
            "args": {"name": proc}}]
    if thread is not None:
        out.append({"ph": "M", "name": "thread_name", "pid": pid, "tid": tid,
                    "args": {"name": thread}})
    return out


def _ev(pid, tid, name, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name, "dur": dur}


def test_op_family_strips_instance_suffixes():
    assert _op_family("fusion.123") == "fusion"
    assert _op_family("dot.4") == "dot"
    assert _op_family("custom-call.7") == "custom-call"
    assert _op_family("copy-done.12") == "copy-done"
    assert _op_family("fusion") == "fusion"
    # must not eat trailing digits that are part of the op name itself
    assert _op_family("all_gather") == "all_gather"


def test_keeps_only_device_op_lane():
    events = (
        _meta(1, 10, "TPU device 0", "Steps")
        + _meta(1, 11, "TPU device 0", "XLA Modules: jit_update")
        + _meta(1, 12, "TPU device 0", "XLA Ops: lane")
        + _meta(2, 20, "python host", "main")
        + [
            _ev(1, 10, "0", 1e6),                 # Steps wrapper: dropped
            _ev(1, 11, "jit_update(...)", 1e6),   # Modules wrapper: dropped
            _ev(1, 12, "fusion.1", 100.0),
            _ev(1, 12, "fusion.2", 50.0),
            _ev(1, 12, "copy-done.3", 25.0),
            _ev(2, 20, "host_compute", 999.0),    # host process: dropped
        ]
    )
    by_op, by_family, total = device_op_table({"traceEvents": events})
    assert total == pytest.approx(175.0)
    assert by_op == {"fusion.1": 100.0, "fusion.2": 50.0, "copy-done.3": 25.0}
    assert by_family == {"fusion": 150.0, "copy-done": 25.0}


def test_fallback_without_thread_metadata_drops_wrapper_lanes_by_name():
    # CPU backend traces may lack thread_name metadata; wrapper events are
    # then recognised by their names ("0", "jit_*", "Steps:*").
    events = (
        _meta(1, 10, "/device:CPU:0 xla", None)
        + [
            _ev(1, 10, "7", 1e6),
            _ev(1, 10, "jit_update(args)", 1e6),
            _ev(1, 10, "Steps: 3", 1e6),
            _ev(1, 10, "reduce.5", 40.0),
            _ev(1, 10, "dot.2", 60.0),
        ]
    )
    by_op, by_family, total = device_op_table({"traceEvents": events})
    assert total == pytest.approx(100.0)
    assert by_family == {"reduce": 40.0, "dot": 60.0}
