"""Round-over-round bench comparison.

Usage::

    python tools/bench_diff.py BENCH_r01.json current.json [--threshold 0.25]

Reads two ``bench.py`` JSON outputs (stable schema:
``{"metric", "value", "unit", "queries": {name: sec}, "sf"}``) and prints a
per-query delta table — which queries regressed, improved, appeared, or
disappeared.  Exit code 1 if any shared query regressed by more than
``threshold`` (relative) AND more than 0.2 s (absolute) — the double bound
keeps sub-second scheduling jitter from flagging.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    # the driver wraps bench.py's line as {"parsed": {...}, "tail": ...}
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    if "queries" not in data:
        raise SystemExit(f"{path}: not a bench.py output (no 'queries' key)")
    # r7+: the driver-captured line is the COMPACT form — abbreviated
    # query keys, integer milliseconds, an "n" count field.  Expand the
    # names via bench._abbrev's inverse and scale back to seconds so
    # diffs against full-form files (BENCH_LOCAL.json, older rounds)
    # keep working.
    if "n" in data and data["queries"]:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from bench import HEADLINE, _abbrev

        inverse = {_abbrev(name): name for name in HEADLINE}
        data = dict(data)
        data["queries"] = {
            inverse.get(k, k): v / 1000.0 for k, v in data["queries"].items()
        }
    return data


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="earlier round's BENCH_r*.json")
    ap.add_argument("current", help="newer bench output")
    ap.add_argument("--threshold", type=float, default=0.25,
                    help="relative regression bound (default 0.25)")
    args = ap.parse_args()

    base, cur = load(args.baseline), load(args.current)
    bq, cq = base["queries"], cur["queries"]
    shared = sorted(set(bq) & set(cq))
    added = sorted(set(cq) - set(bq))
    removed = sorted(set(bq) - set(cq))

    regressions = []
    print(f"{'query':<32} {'base':>8} {'cur':>8} {'delta':>8}")
    for name in shared:
        b, c = bq[name], cq[name]
        delta = c - b
        rel = delta / b if b else 0.0
        flag = ""
        if delta > 0.2 and rel > args.threshold:
            flag = "  REGRESSED"
            regressions.append(name)
        elif delta < -0.2 and rel < -args.threshold:
            flag = "  improved"
        print(f"{name:<32} {b:>8.3f} {c:>8.3f} {delta:>+8.3f}{flag}")

    bt = sum(bq[n] for n in shared)
    ct = sum(cq[n] for n in shared)
    print(f"{'TOTAL (shared)':<32} {bt:>8.3f} {ct:>8.3f} {ct - bt:>+8.3f}")
    for name in added:
        print(f"{name:<32} {'—':>8} {cq[name]:>8.3f}   new")
    for name in removed:
        print(f"{name:<32} {bq[name]:>8.3f} {'—':>8}   removed")

    if regressions:
        print(f"\nREGRESSIONS: {', '.join(regressions)}")
        return 1
    print("\nno regressions beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
