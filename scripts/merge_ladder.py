#!/usr/bin/env python3
"""Merge partial BenchLadder runs into BENCH_LADDER.json.

The ladder main accepts point names as args (sf0.001 sf0.01 sf0.1 x1
x10 x100) and prints one JSON object per run; long rungs run
separately so a crash never loses the cheap points. This script unions
the `points` maps (later files win on conflict), recomputes
growth_per_decade from the union, and writes the final artifact.

Usage: merge_ladder.py OUT.json IN1.json [IN2.json ...]
"""
import json
import sys


def main() -> None:
    out_path, ins = sys.argv[1], sys.argv[2:]
    points: dict[str, dict[str, float]] = {}
    note = ""
    for p in ins:
        with open(p) as f:
            txt = f.read()
        j = json.loads(txt[txt.index("{"):])
        for fam, pts in j["points"].items():
            points.setdefault(fam, {}).update(pts)
        note = j.get("note", note)
    order = ["sf0.001", "sf0.01", "sf0.1", "x1", "x10", "x100"]
    growth = {}
    for fam, pts in points.items():
        have = [k for k in order if k in pts]
        seq = [pts[k] for k in have]
        # both endpoints must be positive: a non-positive newer rung
        # would raise a fractional power of a negative ratio (complex
        # in Python, NaN in the Scala twin) instead of the sentinel
        if len(seq) >= 2 and seq[-2] > 0 and seq[-1] > 0:
            # the last two rungs are one decade apart only when they
            # are ADJACENT in the ladder order: a partial union missing
            # a middle rung (x1 + x100, no x10) spans two decades, so
            # normalize by the actual input growth between the rungs
            decades = order.index(have[-1]) - order.index(have[-2])
            growth[fam] = round((seq[-1] / seq[-2]) ** (1.0 / decades)
                                / 10.0, 4)
        else:
            growth[fam] = -1.0
        points[fam] = dict(zip(have, seq))
    with open(out_path, "w") as f:
        json.dump({"points": points, "growth_per_decade": growth,
                   "note": note}, f, indent=1)
    print(f"wrote {out_path}: {len(points)} families")


if __name__ == "__main__":
    main()
