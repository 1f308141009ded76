#!/usr/bin/env python3
"""Emit the driver bench series as machine-readable JSON (r11 verdict
finding #4: every cross-round comparison was hand-parsed from the
BASELINE.md prose table).

Reads each BENCH_r{N}.json artifact (the driver stores the run's stdout
tail; the last {"metric":"total",...} line is the bench's own compact
JSON), takes the per-round query count from CORRECTNESS_r{N}.json, and
rewrites the "rounds" array in BASELINE.json in place — all other keys
(the driver's metadata) are preserved. Rounds whose driver file has no
parseable JSON line (r1: pre-JSON format; r2: line overflowed the
driver's capture window) are backfilled from the prose table, marked
with a "note". Run after each round: `python3 tools/baseline_series.py`.

Row schema: {round, queries, warm, isolated, cold, interval_index,
passes, note?} — seconds, driver-recorded unless noted; null = not in
that round's artifact.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Rounds with no parseable driver JSON, from the BASELINE.md prose
# table (local numbers — the driver files were not retained).
PROSE_BACKFILL = {
    1: {"warm": 27.1, "isolated": None, "cold": None,
        "note": "local run; driver file not retained (pre-JSON format)"},
    2: {"warm": 34.8, "isolated": None, "cold": 67.0,
        "note": "upper edge of the 26.2-34.8 s local band; driver line "
                "overflowed the capture window"},
}


def bench_json(path):
    """Last {"metric":...} JSON object in the driver-captured tail."""
    tail = json.load(open(path)).get("tail") or ""
    objs = []
    # real newlines — the tails are verbatim stdout captures; splitting
    # on the literal two-char "\n" (the original bug) processed the
    # whole tail as one line, so re.search took the FIRST brace match
    # (possibly a truncated fragment) instead of the documented last
    # metric line
    for line in tail.splitlines():
        if '"metric"' not in line:
            continue
        m = re.search(r"\{.*\}", line)
        if not m:
            continue
        try:
            objs.append(json.loads(m.group(0)))
        except json.JSONDecodeError:
            pass
    return objs[-1] if objs else None


def main():
    rounds = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        n = int(re.search(r"BENCH_r(\d+)\.json", path).group(1))
        corr = os.path.join(ROOT, f"CORRECTNESS_r{n:02d}.json")
        queries = len(json.load(open(corr))) if os.path.exists(corr) else None
        j = bench_json(path)
        row = {"round": n, "queries": queries}
        if j is not None:
            row.update(
                warm=round(j["value"], 3),
                isolated=j.get("isolated_total"),
                cold=j.get("cold_total"),
                interval_index=j.get("interval_index"),
                passes=j.get("passes"))
        else:
            row.update(PROSE_BACKFILL.get(
                n, {"warm": None, "isolated": None, "cold": None,
                    "note": "no parseable driver JSON"}))
            row.setdefault("interval_index", None)
            row.setdefault("passes", None)
        rounds.append(row)

    baseline_path = os.path.join(ROOT, "BASELINE.json")
    baseline = json.load(open(baseline_path)) if os.path.exists(baseline_path) else {}
    baseline["rounds"] = rounds
    with open(baseline_path, "w") as f:
        json.dump(baseline, f, indent=2)
        f.write("\n")
    for r in rounds:
        print(r)
    print(f"wrote {len(rounds)} rounds to {baseline_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
