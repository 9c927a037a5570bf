#!/usr/bin/env python3
"""Maintain BENCH_RECORD.json — the per-query best-of-quiet-runs record.

The host's bench totals swing +/-25% with load (documented in
.claude/skills/verify/SKILL.md), so round-over-round comparison against a
single run keeps generating false regressions. This keeps a committed
per-query RECORD (the minimum over quiet runs) and reports each new run
against it, so "regression" means "worse than the best this code has ever
measured", not "worse than one noisy sample".

Usage:
  bench_record.py merge <bench.json> [--load AVG]   # fold a run into the record
  bench_record.py compare <bench.json> [--ratio R]  # list queries > R x record

A bench.json is either the one-line {"metric": ...} object graft.Bench
prints (also committed per round as BENCH_rNN.json) or a file containing it.
Runs merged with --load > 1.5 are rejected: a loaded host produces times
that are not records.
"""
import json
import sys
from pathlib import Path

RECORD = Path(__file__).resolve().parent.parent / "BENCH_RECORD.json"


def load_bench(path):
    text = Path(path).read_text()
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            obj = json.loads(line)
            # a compact one-line wrapper ({"parsed": {"queries": ...}})
            # matches the substring scan too — fall through to the
            # wrapper-unwrapping path instead of returning it raw
            if "queries" in obj:
                return obj
            break
    obj = json.loads(text)
    # the driver's BENCH_rNN.json wraps graft.Bench's line under "parsed"
    # (or leaves it inside a captured "tail" when parsing was truncated)
    if "queries" not in obj and isinstance(obj.get("parsed"), dict):
        obj = obj["parsed"]
    if "queries" not in obj and isinstance(obj.get("tail"), str):
        # the driver's capture keeps a bounded tail that can truncate the
        # JSON line mid-object — salvage whatever ("q_name": float) pairs
        # survive (partial per-query data is still record-grade)
        import re
        # the number must be FOLLOWED by a JSON delimiter: a pair cut off
        # at the tail boundary ("q_foo":12.3 of 12.34) would otherwise
        # merge an artificially low time as a permanent record
        pairs = re.findall(r'"(q_[A-Za-z0-9_]+)":(-?[0-9.]+)(?=[,}])',
                           obj["tail"])
        if pairs:
            return {"queries": {k: float(v) for k, v in pairs}}
    return obj


def load_record():
    if RECORD.exists():
        return json.loads(RECORD.read_text())
    return {"note": "per-query best-of-quiet-runs seconds at sf0.1 "
                    "(merged by tools/bench_record.py; -1 runs excluded)",
            "queries": {}}


def main():
    if len(sys.argv) < 3 or sys.argv[1] not in ("merge", "compare"):
        print(__doc__)
        return 1
    cmd, path = sys.argv[1], sys.argv[2]
    opts = dict(zip(sys.argv[3::2], sys.argv[4::2]))
    bench = load_bench(path)
    if "queries" not in bench:
        print(f"no per-query data found in {path} (not a graft.Bench line, "
              "a driver BENCH_rNN.json wrapper, or a salvageable tail)")
        return 1
    queries = {k: v for k, v in bench["queries"].items() if v >= 0}
    record = load_record()
    rec = record["queries"]

    run_canary = bench.get("canary_sec", -1.0)

    if cmd == "merge":
        load = float(opts.get("--load", "0"))
        if load > 1.5:
            print(f"refusing to merge: load average {load} > 1.5 "
                  "(a loaded host cannot set records)")
            return 1
        improved = 0
        # each record time is PAIRED with the canary of the run that set
        # it: normalization compares "this run's host speed" against "the
        # host speed when the record was set". A single global-min canary
        # (the pre-r17 scheme) could come from a DIFFERENT run than any
        # record, systematically inflating every canary-relative record
        # and under-flagging real regressions.
        qcan = record.setdefault("query_canaries", {})
        for q, t in queries.items():
            if q not in rec or t < rec[q]:
                rec[q] = round(t, 3)
                if run_canary and run_canary > 0:
                    qcan[q] = round(run_canary, 3)
                else:
                    qcan.pop(q, None)
                improved += 1
        if run_canary and run_canary > 0:
            old = record.get("canary_sec")
            if old is None or run_canary < old:
                record["canary_sec"] = round(run_canary, 3)
        sched = bench.get("sched_canary_sec", -1.0)
        if sched and sched > 0:
            old = record.get("sched_canary_sec")
            if old is None or sched < old:
                record["sched_canary_sec"] = round(sched, 3)
        RECORD.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
        print(f"merged {len(queries)} queries; {improved} records improved; "
              f"{len(rec)} total in {RECORD.name}"
              + (f"; canary {record.get('canary_sec')}s"
                 if "canary_sec" in record else ""))
        return 0

    ratio = float(opts.get("--ratio", "1.5"))
    # host-speed normalization: the run's CPU-bound canary vs the canary
    # PAIRED with each record (the canary of the run that set it; the
    # global min is only a fallback for pre-pairing records). A loaded
    # window inflates EVERY time by roughly the canary's factor, so
    # ratios are divided by it (never below 1.0 — a faster-than-record
    # host must not hide a real regression).
    rec_canary = record.get("canary_sec")
    qcan = record.get("query_canaries", {})

    def host_for(q):
        base = qcan.get(q, rec_canary)
        if run_canary and run_canary > 0 and base and base > 0:
            return max(1.0, run_canary / base)
        return 1.0

    if run_canary and run_canary > 0 and rec_canary and rec_canary > 0:
        print(f"host-speed canary: run {run_canary:.2f}s vs record min "
              f"{rec_canary:.2f}s (normalizing per-query by each record's "
              "paired canary)")
    sched = bench.get("sched_canary_sec", -1.0)
    rec_sched = record.get("sched_canary_sec")
    if sched and sched > 0 and rec_sched:
        print(f"scheduler-latency canary: run {sched:.3f}s vs record "
              f"{rec_sched:.3f}s ({sched / rec_sched:.2f}x — adjudicates "
              "streaming/micro-batch rows the CPU canary can't see)")
    flagged, raw_flagged = [], 0
    any_norm = False
    for q, t in sorted(queries.items()):
        if q in rec and rec[q] > 0:
            host = host_for(q)
            if host != 1.0:
                any_norm = True
            if t / rec[q] > ratio:
                raw_flagged += 1
            if t / (rec[q] * host) > ratio:
                flagged.append((q, t, rec[q], t / (rec[q] * host)))
    norm = " (host-normalized)" if any_norm else ""
    if not flagged:
        print(f"all {len(queries)} queries within {ratio}x of record{norm}"
              + (f"; {raw_flagged} raw flags absorbed by the canary"
                 if raw_flagged else ""))
    else:
        print(f"{len(flagged)} queries above {ratio}x of record{norm} "
              f"(raw flags: {raw_flagged}; "
              "rerun on a quiet host before believing any):")
        for q, t, r, x in sorted(flagged, key=lambda f: -f[3]):
            print(f"  {q}: {t:.2f}s vs record {r:.2f}s ({x:.1f}x normalized)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
