#!/usr/bin/env python3
"""Driver-tail parse assertion (VERDICT r10 item 3).

  tail_parse.py <bench_log> [tail_chars]

Mimics exactly what the round driver does with Bench output: take the
LAST `tail_chars` (default 2000) characters of the log, split into
lines, take the last non-empty line, and json-parse it. Fails unless
that line is a JSON object with metric=="total" and a non-empty
"queries" map whose values are all >= 0 (no -1 failure sentinels).

Round-10 context: BENCH_r10.json recorded rc:124/parsed:null because
the bench's scale block blew the driver's time box — and the round's
own tail-parse proof had been produced under gate env vars, so the
regression shipped unseen. This check runs against the SAME no-env
invocation the gate now uses, inside the gate.
"""
import json
import sys


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    tail_chars = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    with open(sys.argv[1], "rb") as f:
        data = f.read()
    tail = data[-tail_chars:].decode("utf-8", errors="replace")
    lines = [ln.strip() for ln in tail.splitlines() if ln.strip()]
    if not lines:
        print(f"tail_parse FAIL: empty {tail_chars}-char tail of {sys.argv[1]}")
        return 1
    last = lines[-1]
    try:
        rec = json.loads(last)
    except json.JSONDecodeError as e:
        print(f"tail_parse FAIL: last tail line is not JSON ({e}):")
        print(f"  {last[:200]}")
        return 1
    if not isinstance(rec, dict) or rec.get("metric") != "total":
        # .get only exists on dicts — a bare JSON scalar/array here would
        # otherwise turn the diagnostic itself into an AttributeError
        # traceback (round-12 review).
        what = (f"metric={rec.get('metric')!r}" if isinstance(rec, dict)
                else f"a JSON {type(rec).__name__}, not an object")
        print(f"tail_parse FAIL: last tail line parses but is not the "
              f"headline record ({what})")
        return 1
    queries = rec.get("queries")
    if not isinstance(queries, dict) or not queries:
        print("tail_parse FAIL: headline record has no 'queries' map")
        return 1
    # Sentinel scan covers the meta section too — a failed meta query
    # (e.g. q_tuner_loop) renders as -1 in the same headline record.
    meta = rec.get("meta") or {}
    bad = {k: v for m in (queries, meta) for k, v in m.items()
           if not isinstance(v, (int, float)) or v < 0}
    if bad:
        print(f"tail_parse FAIL: failed-query sentinels in the headline "
              f"record: {sorted(bad)}")
        return 1
    print(f"tail_parse OK: driver-shaped {tail_chars}-char tail parses — "
          f"total={rec.get('value')}s, {len(queries)} queries, "
          f"line_len={len(last)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
