"""Bench emission contract + perf gate semantics (pure host logic).

The driver parses bench.py stdout and the judge reads the committed
floors; these tests pin the pieces that must not silently change:
compact-first emission, wire-adjusted effective floors for the
wire-bound serving configs, and the gate honoring the bench's own
floor verdict."""

import importlib.util
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wire_floor_adjusts_only_downward():
    bench = _load("bench_mod", os.path.join(HERE, "bench.py"))
    metric = "person26 VGA RGB-D detect+depth-rescore throughput (1 chip)"
    assert metric in bench.FLOORS
    static = bench.FLOORS[metric]
    # wire_mbps measures the live channel fresh on every call; stub it
    # (the logic under test is the floor adjustment, not the probe)
    bench.wire_mbps = lambda: 40.0
    # fast tunnel: static floor applies unchanged
    fp, wx = bench.wire_floor(metric, static - 0.1, 1.54)
    assert wx["floor_effective"] == static
    assert fp is False
    # slow tunnel: the effective floor drops to 0.85x the wire bound
    bench.wire_mbps = lambda: 15.0
    fp2, wx2 = bench.wire_floor(metric, 9.0, 1.54)
    bound = 15.0 / 1.54
    assert abs(wx2["wire_bound_rate"] - round(bound, 1)) < 1e-6
    assert wx2["floor_effective"] == round(min(static, 0.85 * bound), 1)
    assert fp2 is True  # 9.0 >= 8.3
    # the wire adjustment can only LOWER the floor, never raise it
    bench.wire_mbps = lambda: 400.0
    _, wx3 = bench.wire_floor(metric, 100.0, 1.54)
    assert wx3["floor_effective"] == static


def test_emit_compact_line_is_small(capsys):
    bench = _load("bench_mod2", os.path.join(HERE, "bench.py"))
    bench.emit(
        4,
        "person26 VGA 64-image batched throughput (1 chip)",
        28.18,
        "images/sec",
        1.98,
        note="x" * 800,  # big detail payload must NOT bloat line 1
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    compact = json.loads(out[0])
    assert len(out[0]) <= 220
    assert compact["value"] == 28.18
    assert compact["floor_pass"] is True
    detail = json.loads(out[1])
    assert detail["detail"] is True and len(detail["note"]) == 800


def test_perf_gate_honors_emitted_floor_pass(tmp_path):
    """A wire-bound config below the static floor but above its emitted
    effective floor must PASS the gate; the same value with
    floor_pass=false must FAIL."""
    budget = json.load(
        open(os.path.join(HERE, "tools", "perf_budget.json"))
    )
    lines = []
    for name, floor in budget.items():
        lines.append(
            {"metric": name, "value": floor + 1.0, "config": 1}
        )
    # overwrite the rgbd record with a wire-adjusted pass below static
    rgbd = "person26 VGA RGB-D detect+depth-rescore throughput (1 chip)"
    lines = [l for l in lines if l["metric"] != rgbd]
    lines.append(
        {
            "metric": rgbd,
            "value": budget[rgbd] - 5.0,
            "floor_pass": True,
            "floor": budget[rgbd] - 6.0,
        }
    )
    p = tmp_path / "bench.jsonl"
    p.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "perf_gate.py"), str(p)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    # now the same value with an explicit failing verdict
    lines[-1]["floor_pass"] = False
    p.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    r2 = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "perf_gate.py"), str(p)],
        capture_output=True,
        text=True,
    )
    assert r2.returncode == 1
