"""Benchmark trend guard: diff bench results across rounds.

Compares the current benchmark output (``BENCH_ALL.json`` by default,
or a fresh ``python bench.py`` capture piped in) against the most
recent committed per-round artifact (``BENCH_r0N.json``) and reports
per-metric deltas.  Exits non-zero if any metric regressed by more
than ``--threshold`` (default 20%), so a round-over-round perf drop
like the round-3 city-RT regression (108.7 -> 29.7 krays/s, unnoticed
because nothing compared artifacts) fails loudly instead of silently
shipping.

Usage:
    python tools/bench_trend.py                  # BENCH_ALL.json vs last BENCH_r0N.json
    python tools/bench_trend.py --current X.json --baseline Y.json
    python bench.py | python tools/bench_trend.py --stdin

Both inputs accept either a plain list of ``{"metric", "value", ...}``
dicts (the ``BENCH_ALL.json`` format) or the driver's per-round wrapper
``{"n": N, "tail": "...json lines..."}`` (the ``BENCH_r0N.json``
format).
"""

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_metrics(obj):
    """Normalize either artifact format to {metric: (value, unit)}."""
    if isinstance(obj, dict) and "tail" in obj:
        rows = []
        for line in obj["tail"].splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        obj = rows
    out = {}
    for row in obj:
        if isinstance(row, dict) and "metric" in row and "value" in row:
            out[row["metric"]] = (float(row["value"]), row.get("unit", ""))
    return out


def _load(path):
    with open(path) as f:
        return _parse_metrics(json.load(f))


def _latest_round_artifact():
    arts = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    return arts[-1] if arts else None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--current", default=os.path.join(REPO, "BENCH_ALL.json"),
                    help="current results (BENCH_ALL.json format)")
    ap.add_argument("--baseline", default=None,
                    help="baseline artifact (default: latest BENCH_r0N.json)")
    ap.add_argument("--stdin", action="store_true",
                    help="read current results as JSON lines from stdin")
    ap.add_argument("--threshold", type=float, default=0.20,
                    help="fail on regressions larger than this fraction")
    args = ap.parse_args(argv)

    if args.stdin:
        rows = []
        for line in sys.stdin:
            line = line.strip()
            if line.startswith("{"):
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        cur = _parse_metrics(rows)
        cur_name = "<stdin>"
    else:
        cur = _load(args.current)
        cur_name = os.path.basename(args.current)

    base_path = args.baseline or _latest_round_artifact()
    if base_path is None:
        print("bench_trend: no baseline BENCH_r0N.json found; nothing to compare")
        return 0
    base = _load(base_path)

    print(f"bench_trend: {cur_name} vs {os.path.basename(base_path)} "
          f"(threshold {args.threshold:.0%})")
    print(f"{'metric':<48} {'baseline':>12} {'current':>12} {'delta':>8}")
    regressions = []
    for metric in sorted(set(base) | set(cur)):
        if metric not in base:
            print(f"{metric:<48} {'-':>12} {cur[metric][0]:>12.3f}   (new)")
            continue
        if metric not in cur:
            print(f"{metric:<48} {base[metric][0]:>12.3f} {'-':>12}   (GONE)")
            regressions.append((metric, "metric disappeared"))
            continue
        b, c = base[metric][0], cur[metric][0]
        delta = (c - b) / b if b else 0.0
        flag = ""
        if delta < -args.threshold:
            flag = "  << REGRESSION"
            regressions.append((metric, f"{b:.3f} -> {c:.3f} ({delta:+.1%})"))
        print(f"{metric:<48} {b:>12.3f} {c:>12.3f} {delta:>+7.1%}{flag}")

    if regressions:
        print(f"\nbench_trend: {len(regressions)} regression(s) beyond "
              f"{args.threshold:.0%}:")
        for metric, detail in regressions:
            print(f"  - {metric}: {detail}")
        return 1
    print("\nbench_trend: ok (no regressions beyond threshold)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
