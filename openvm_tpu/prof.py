"""openvm-prof equivalent: metrics JSON -> markdown tables and diffs.

TPU-native re-design of the reference `openvm-prof` binary
(reference crates/prof/src/{main,aggregate,summary,types}.rs, SURVEY.md
section 2.19): post-processes the JSON written by
``metrics.run_with_metric_collection`` (OUTPUT_PATH) into per-group
markdown summary tables, with optional diff columns against a previous
run's JSON.

Usage:
    python -m openvm_tpu.prof metrics.json [--prev old.json] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys

# the reference's primary metric set (docs/crates/metrics.md:10-25)
PRIMARY = [
    "total_proof_time_ms",
    "execute_e1_time_ms",
    "execute_metered_time_ms",
    "execute_preflight_time_ms",
    "trace_gen_time_ms",
    "stark_prove_excluding_trace_time_ms",
    "insns",
    "execute_e1_insn_mi/s",
    "main_cells_used",
    "total_cells_used",
]


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _group_of(entry: dict) -> str:
    return str(entry.get("group", entry.get("segment", "app_proof")))


def aggregate(metrics: dict) -> dict:
    """{group: {metric: {sum, count, min, max}}}"""
    out: dict = {}
    for name, entries in metrics.items():
        for e in entries:
            v = e.get("value")
            if not isinstance(v, (int, float)):
                continue
            g = out.setdefault(_group_of(e), {})
            s = g.setdefault(name, {"sum": 0.0, "count": 0,
                                    "min": float("inf"),
                                    "max": float("-inf")})
            s["sum"] += v
            s["count"] += 1
            s["min"] = min(s["min"], v)
            s["max"] = max(s["max"], v)
    return out


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return f"{int(v):,}"
    return f"{v:,.2f}"


def _diff_cell(cur: float, prev: float | None) -> str:
    if prev is None or prev == 0:
        return _fmt(cur)
    pct = 100.0 * (cur - prev) / prev
    arrow = "🔴" if pct > 2 else ("🟢" if pct < -2 else "")
    return f"{_fmt(cur)} ({pct:+.1f}%{arrow})"


def to_markdown(agg: dict, prev_agg: dict | None = None) -> str:
    lines = []
    for group in sorted(agg):
        lines.append(f"### group: {group}\n")
        lines.append("| metric | sum | count | min | max |")
        lines.append("|---|---|---|---|---|")
        stats = agg[group]
        ordered = [m for m in PRIMARY if m in stats] + sorted(
            m for m in stats if m not in PRIMARY)
        for m in ordered:
            s = stats[m]
            prev_sum = None
            if prev_agg and group in prev_agg and m in prev_agg[group]:
                prev_sum = prev_agg[group][m]["sum"]
            lines.append(
                f"| {m} | {_diff_cell(s['sum'], prev_sum)} | {s['count']} "
                f"| {_fmt(s['min'])} | {_fmt(s['max'])} |")
        lines.append("")
    return "\n".join(lines)


def summary_line(agg: dict) -> str:
    """One-line TL;DR like the reference's summary table row."""
    total = sum(s["sum"] for g in agg.values()
                for m, s in g.items() if m == "total_proof_time_ms")
    insns = max((s["max"] for g in agg.values()
                 for m, s in g.items() if m == "insns"), default=0)
    return (f"total_proof_time: {_fmt(total)} ms | insns: {_fmt(insns)}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="openvm-tpu-prof")
    ap.add_argument("metrics_json")
    ap.add_argument("--prev", help="previous run's metrics JSON for diffs")
    ap.add_argument("--out", help="write markdown here (default stdout)")
    args = ap.parse_args(argv)

    agg = aggregate(load(args.metrics_json))
    prev_agg = aggregate(load(args.prev)) if args.prev else None
    md = f"## {summary_line(agg)}\n\n" + to_markdown(agg, prev_agg)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print(f"wrote {args.out}")
    else:
        print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
