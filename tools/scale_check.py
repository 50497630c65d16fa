#!/usr/bin/env python3
"""Scale-exponent ledger gate (VERDICT r15 item 2).

The repo's "zero super-linear" claim was re-proved by hand each round by
reading the committed decade evidence; this encodes it. SCALE_LEDGER.txt
names the bench records (groups of agreeing reps) that constitute the
current certified scale evidence; this script FAILs when any tracked
query's BYTES-normalized exponent exceeds the threshold, when a record
in the ledger is not probe-certified healthy, or when a multi-rep group
no longer corroborates a query with at least two reps.

  python3 tools/scale_check.py [SCALE_LEDGER.txt]

Rules (the r15 adjudication, mechanized):
  - healthy-stamp required: each record's scale.healthy must be true —
    evidence taken without a clean probe bracket certifies nothing
    (the same arbitration gate_diff applies to headline records).
  - bytes exponents only: raw exponents overread on byte-bound queries
    because ScaleData's token salting inflates bytes beyond xfactor
    (BENCH_r12 item 3); scale.exponents_bytes is the honest map and a
    record without a usable bytes_factor is not evidence.
  - two-rep agreement: in a group with >=2 reps, every query must appear
    in >=2 reps and EVERY rep must read <= threshold — one super-linear
    rep is a regression signal, not an outvoted outlier (contention only
    ever inflates, so a clean rep cannot excuse a dirty one the way a
    min can for absolute times; exponents are ratios of two dirs'
    mins and a super-linear reading must be re-measured, not averaged).
  - a -1 exponent (the query failed at one dir) fails loudly.

Threshold: 1.0 (sub-linear-or-linear in bytes), env SCALE_CHECK_MAX to
override for drills. Exit 0 prints `scale_check OK: ...`; any violation
prints `scale_check FAIL: ...` lines and exits 1.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_EXP = float(os.environ.get("SCALE_CHECK_MAX", "1.0"))


def load_ledger(path):
    groups = {}
    for ln in open(path):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split()
        if len(parts) != 2:
            print(f"scale_check FAIL: malformed ledger line: {ln!r}")
            sys.exit(1)
        group, rel = parts
        f = rel if os.path.isabs(rel) else os.path.join(REPO, rel)
        groups.setdefault(group, []).append(f)
    return groups


def main():
    ledger = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALE_LEDGER.txt")
    if not os.path.isfile(ledger):
        print(f"scale_check FAIL: no ledger at {ledger}")
        sys.exit(1)
    groups = load_ledger(ledger)
    if not groups:
        print("scale_check FAIL: ledger is empty — the zero-super-linear "
              "claim needs at least one certified record")
        sys.exit(1)
    failures = []
    total_queries = 0
    total_reps = 0
    for group, files in sorted(groups.items()):
        per_query = {}  # query -> [exponent per rep]
        for f in files:
            name = os.path.relpath(f, REPO)
            try:
                rec = json.load(open(f))
            except (OSError, json.JSONDecodeError) as e:
                failures.append(f"{group}: {name} unreadable ({e})")
                continue
            sc = rec.get("scale") or {}
            if sc.get("healthy") is not True:
                failures.append(f"{group}: {name} is not probe-certified "
                                f"(scale.healthy={sc.get('healthy')}) — "
                                "uncertified evidence cannot back the ledger")
                continue
            bf = sc.get("bytes_factor")
            if not isinstance(bf, (int, float)) or bf <= 1.0:
                failures.append(f"{group}: {name} has no usable bytes_factor "
                                f"({bf}) — bytes exponents are the gated map")
                continue
            exps = sc.get("exponents_bytes") or {}
            if not exps:
                failures.append(f"{group}: {name} carries no exponents_bytes")
                continue
            total_reps += 1
            for q, e in exps.items():
                per_query.setdefault(q, []).append((name, e))
        multi = len(files) >= 2
        for q in sorted(per_query):
            reps = per_query[q]
            if multi and len(reps) < 2:
                failures.append(f"{group}: {q} appears in only "
                                f"{len(reps)} of {len(files)} reps — "
                                "two-rep agreement not met")
            for name, e in reps:
                # Bench emits exactly -1 when a query failed at a dir;
                # mildly negative exponents are real (a flat sub-second
                # query whose scaled time dips under its base time on
                # noise — r15's ledger reads -0.04 on q_auc_rank).
                if not isinstance(e, (int, float)) or e <= -0.5:
                    failures.append(f"{group}: {q} exponent {e} in {name} — "
                                    "the query failed at one dir")
                elif e > MAX_EXP:
                    failures.append(f"{group}: {q} bytes-exponent {e} > "
                                    f"{MAX_EXP} in {name} — super-linear "
                                    "scale regression")
        total_queries += len(per_query)
    if failures:
        for f in failures:
            print(f"scale_check FAIL: {f}")
        print(f"scale_check FAIL: {len(failures)} violation(s) across "
              f"{len(groups)} ledger group(s)")
        sys.exit(1)
    print(f"scale_check OK: {total_queries} query-group entries <= "
          f"{MAX_EXP} bytes across {total_reps} certified reps "
          f"({len(groups)} groups)")


if __name__ == "__main__":
    main()
