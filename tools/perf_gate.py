"""Perf-regression gate over bench.py output (the missing L7 CI row).

The reference ships no perf jobs (SURVEY §4: CI = build matrix +
config smoke tests); this adds the TPU-native equivalent: committed
per-config throughput floors that fail the gate when a change regresses
serving performance.

Usage:
    python bench.py | tee /tmp/bench.jsonl
    python tools/perf_gate.py /tmp/bench.jsonl    # exit 1 on regression

Floors live in tools/perf_budget.json as {config_name: min_images_sec}.
They are set ~15% under the recorded steady-state numbers so tunnel
jitter doesn't flake the gate, and must be ratcheted UP when a
deliberate optimization lands (never down without a recorded reason).
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main(path: str) -> int:
    with open(os.path.join(HERE, "perf_budget.json")) as f:
        budget = json.load(f)
    lines = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    lines.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    if not lines:
        print("perf_gate: no JSON bench lines found", file=sys.stderr)
        return 2
    seen = {}
    for rec in lines:
        name = rec.get("metric")
        if name in budget:
            # wire-bound serving configs emit a wire-adjusted effective
            # floor (bench.py::wire_floor) — honor their own verdict so
            # tunnel congestion doesn't read as a framework regression
            seen[name] = (
                float(rec["value"]),
                rec.get("floor_pass"),
                rec.get("floor"),
            )
    failures = []
    for name, floor in budget.items():
        if name not in seen:
            failures.append(f"MISSING  {name} (no bench line)")
            continue
        value, fp, eff = seen[name]
        eff = floor if eff is None else eff
        ok = fp if fp is not None else value >= floor
        if not ok:
            failures.append(
                f"REGRESSED {name}: {value:.2f} < floor {eff:.2f}"
            )
        else:
            print(f"ok  {name}: {value:.2f} >= {eff:.2f}")
    for f_ in failures:
        print(f_)
    print("perf_gate:", "FAIL" if failures else "PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
