#!/usr/bin/env python3
"""Streaming-throughput diff against the declared epoch (VERDICT r11
item 2 / round 12).

  stream_diff.py <new_jsonl> [epoch_jsonl]

<new_jsonl>: one StreamScale JSON line per (query, dir) — e.g.
  sbt "runMain graft.tools.StreamScale localdata/sf1 localdata/sf10" \
    | grep '"query"' > /tmp/stream_new.jsonl

epoch_jsonl defaults to the file named by bench_evidence/STREAM_EPOCH.txt
("epoch:" line). Checks, per (query, basename(dir)):

- events_per_sec < epoch / TOLERANCE      -> FAIL (state machine slowed)
- events_per_sec > epoch * TOLERANCE      -> NOTE (re-epoch candidate)
- pair present in epoch, missing from new -> FAIL (coverage lost)
- decade knee: for every query measured at two dirs in the NEW file,
  throughput at the larger dir must be >= KNEE_FRACTION of the smaller
  dir's (the r11 epoch shows throughput RISING sf1->sf10 on every state
  machine — amortized per-event cost falls as micro-batches grow; a
  large drop is a super-linear state-store cost knee) -> FAIL

TOLERANCE is 1.3 (not the batch gate's 1.15): streaming wall times at
5-35 s on a VM carry shuffle+checkpoint IO noise the batch suite's
min-of-passes discipline can't fully strip (the r11 epoch itself has a
58.9-vs-34.6 s spread between two same-binary runs of one query).
Per-query it still catches any real regression well before the 2x
baseline budget.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOLERANCE = float(os.environ.get("STREAM_DIFF_TOLERANCE", "1.3"))
KNEE_FRACTION = float(os.environ.get("STREAM_DIFF_KNEE", "0.5"))


def fail(msg):
    # Every failure exits through here so the greppable 'stream_diff
    # FAIL:' contract lands on ONE stream (stdout, like the budget/
    # throughput failures) — sys.exit(str) would print to stderr and
    # split the contract across streams (round-12 review).
    print(f"stream_diff FAIL: {msg}")
    sys.exit(1)


def read_lines(path, what):
    try:
        return open(path).read().splitlines()
    except OSError as e:
        fail(f"{what} unreadable ({path}): {e}")


def read_records(path):
    # On-format failures (round-12 review, same contract class as
    # scan_check): a mistyped path, a moved epoch file, a truncated jsonl
    # line, or a record missing/zeroing a required field must emit the
    # 'stream_diff FAIL: ...' line the rest of the gate tooling greps
    # for, not a raw traceback — and must never pass silently. Field
    # validation lives HERE so it covers new-only (query, dir) pairs the
    # epoch comparison loop would never visit: events_per_sec <= 0 is an
    # empty events table or broken measurement, not a throughput.
    recs = {}
    for ln in read_lines(path, "records file"):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        try:
            d = json.loads(ln)
            key = (d["query"], os.path.basename(d["dir"].rstrip("/")))
            if not (isinstance(d["events"], (int, float))
                    and isinstance(d["events_per_sec"], (int, float))):
                raise TypeError("events/events_per_sec not numeric")
            if d["events_per_sec"] <= 0:
                raise ValueError("non-positive events_per_sec — empty "
                                 "events table or broken measurement")
            recs[key] = d
        except (ValueError, KeyError, TypeError, AttributeError) as e:
            fail(f"malformed record line in {path} ({e}): {ln[:120]}")
    return recs


def epoch_path():
    pointer = os.path.join(REPO, "bench_evidence", "STREAM_EPOCH.txt")
    for ln in read_lines(pointer, "epoch pointer"):
        if ln.startswith("epoch:"):
            return os.path.join(REPO, ln.split(":", 1)[1].strip())
    fail(f"no 'epoch:' line in {pointer}")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    new = read_records(sys.argv[1])
    epochf = sys.argv[2] if len(sys.argv) > 2 else epoch_path()
    epoch = read_records(epochf)
    if not new:
        fail(f"no records parsed from {sys.argv[1]}")
    # An empty epoch must fail too (round-12 review): zero comparison
    # pairs would print OK with nothing compared — a regression passing
    # because the baseline file was truncated to comments.
    if not epoch:
        fail(f"no records parsed from epoch file {epochf}")
    failures, notes = [], []
    for key, e in sorted(epoch.items()):
        n = new.get(key)
        q, d = key
        if n is None:
            failures.append(f"{q}@{d}: in epoch but missing from new run")
            continue
        ratio = n["events_per_sec"] / e["events_per_sec"]
        if ratio < 1.0 / TOLERANCE:
            failures.append(f"{q}@{d}: {n['events_per_sec']:,} ev/s vs epoch "
                            f"{e['events_per_sec']:,} ({ratio:.2f}x, "
                            f"tolerance {1/TOLERANCE:.2f}x)")
        elif ratio > TOLERANCE:
            notes.append(f"{q}@{d}: {ratio:.2f}x FASTER than epoch — "
                         "re-epoch candidate")
        else:
            print(f"stream_diff OK {q}@{d}: {n['events_per_sec']:,} ev/s "
                  f"({ratio:.2f}x epoch)")
    # Decade knee within the new run: group by query, order dirs by events.
    by_query = {}
    for (q, d), n in new.items():
        by_query.setdefault(q, []).append(n)
    for q, rows in sorted(by_query.items()):
        rows = sorted(rows, key=lambda r: r["events"])
        for small, big in zip(rows, rows[1:]):
            # events_per_sec > 0 guaranteed by read_records validation.
            frac = big["events_per_sec"] / small["events_per_sec"]
            if frac < KNEE_FRACTION:
                failures.append(
                    f"{q}: decade knee — {small['events']:,}→{big['events']:,} "
                    f"events drops throughput to {frac:.2f}x "
                    f"(floor {KNEE_FRACTION})")
    for n in notes:
        print(f"stream_diff NOTE: {n}")
    if failures:
        for f in failures:
            print(f"stream_diff FAIL: {f}")
        return 1
    print(f"stream_diff OK: {len(new)} records vs epoch "
          f"(tolerance {TOLERANCE}x, knee floor {KNEE_FRACTION})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
