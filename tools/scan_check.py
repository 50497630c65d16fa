#!/usr/bin/env python3
"""Corpus-scan budget check (VERDICT r9 item 4).

  scan_check.py <reuseprobe_output> [budget_file] [registry_json]

Parses `sbt "runMain graft.tools.ReuseProbe --all"` output (executed
final adaptive plans, ground truth for "how many times does this query
scan the corpus") and compares each query's corpus-scan count against
the committed per-query budget in SCAN_BUDGET.txt. The r9 audit found a
44-scan blowup (triangle count) by hand; this makes the audit a gate:

- measured > budget          -> FAIL (a plan change re-introduced replay)
- query missing from budget  -> FAIL (new queries must declare a budget)
- measured < budget          -> NOTE (tighten the committed budget), unless
                                the budget line carries an annotation token
                                (e.g. `q07_anti_join 2 aqe_empty_relation`)
                                declaring the gap expected -> OK (annotated).
                                Standing NOTEs train readers to skip NOTEs
                                (VERDICT r13 item 3); an annotation is the
                                machine-readable form of "this budget is
                                deliberately loose, here's why".
- budgeted but not probed    -> FAIL when still in the registry (a probe
                                that silently skips a query would wave its
                                replay regressions through — ADVICE r10);
                                NOTE only when absent from the registry
                                (query legitimately removed) or when no
                                registry_json was given

registry_json is Verify's registry.json — the FULL SparkEntry.queries
name list (the gate already produces it). Do NOT pass oracle_sql.json:
that is only the SQL-expressible subset of the registry, and an
oracle-less query would escape this check through it. (A JSON object
also works — its keys are used.) Streaming queries (q_stream*,
q38-q42) are exempt from the FAIL because ReuseProbe --all excludes
them by design.

Budget file format: one `<query> <max_corpus_scans>` per line, `#`
comments allowed. Scratch reads (Materialize barriers) are deliberately
unbudgeted — they are the cheap byproduct of removing corpus replays.
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"^(q\S+)\s+corpus=\s*(\d+)\s+scratch=\s*(\d+)")


def fail(msg):
    # One stream for the greppable contract: every 'scan_check FAIL:'
    # line goes to stdout like the budget-overrun failures in main() —
    # sys.exit(str) would print to stderr and split the contract
    # (round-12 review).
    print(f"scan_check FAIL: {msg}")
    sys.exit(1)


def read_lines(path, what):
    # On-format failure (round-12 review, same contract class as the
    # registry.json handler below): a missing/unreadable input emits the
    # tool's own 'scan_check FAIL: ...' line, not a raw traceback.
    try:
        return open(path).read().splitlines()
    except OSError as e:
        fail(f"{what} unreadable ({path}): {e}")


def parse_probe(path):
    seen = {}
    for ln in read_lines(path, "probe_log"):
        m = LINE.match(ln.strip())
        if m:
            seen[m.group(1)] = int(m.group(2))
    return seen


def parse_budget(path):
    budget = {}
    for ln in read_lines(path, "budget_file"):
        ln = ln.split("#", 1)[0].strip()
        if not ln:
            continue
        parts = ln.split()
        # 2 fields: `name cap`. 3 fields: `name cap annotation` — the
        # annotation declares the cap deliberately above the measured
        # count (prints OK (annotated) instead of a tighten-NOTE).
        if len(parts) not in (2, 3):
            fail(f"budget_file line malformed ({path}): {ln!r} "
                 "(want `name cap [annotation]`)")
        try:
            budget[parts[0]] = (int(parts[1]),
                                parts[2] if len(parts) == 3 else None)
        except ValueError as e:
            fail(f"budget_file line malformed ({path}): {ln!r} ({e})")
    return budget


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    probe = parse_probe(sys.argv[1])
    budget_path = sys.argv[2] if len(sys.argv) > 2 \
        else os.path.join(REPO, "SCAN_BUDGET.txt")
    budget = parse_budget(budget_path)
    registry = None
    if len(sys.argv) > 3:
        import json
        # Fail closed AND on-format (ADVICE r11): a missing/malformed
        # registry.json (e.g. a gate run against a build predating Verify's
        # registry.json emission) must follow the tool's own 'scan_check
        # FAIL: ...' diagnostic contract, not die with a raw traceback.
        # TypeError included (round-12 review): a registry file holding a
        # JSON scalar (null from a truncated emission, a bare number)
        # parses fine and then blows up in set() — same contract applies.
        try:
            registry = set(json.load(open(sys.argv[3])))
        except (OSError, ValueError, TypeError) as e:
            print(f"scan_check FAIL: registry_json unreadable "
                  f"({sys.argv[3]}): {e}")
            return 1
    if not probe:
        print(f"scan_check FAIL: no ReuseProbe rows parsed from {sys.argv[1]}")
        return 1
    # Vacuous-pass guard (r10 self-review): ReuseProbe classifies corpus
    # scans by the '/testdata/' path substring, so probing against a dir
    # outside testdata reports corpus=0 everywhere — which would wave any
    # replay regression through. A registry where literally no query reads
    # the corpus is a misconfigured probe, not a clean audit.
    if all(v == 0 for v in probe.values()):
        print("scan_check FAIL: every probed query reports 0 corpus scans — "
              "the probe dir is likely outside /testdata/ (ReuseProbe "
              "classifies corpus scans by path); re-run against a testdata sf dir")
        return 1
    failures, notes, annotated = [], [], []
    for q, scans in sorted(probe.items()):
        entry = budget.get(q)
        cap, note = entry if entry is not None else (None, None)
        if cap is None:
            failures.append(f"{q}: {scans} corpus scans but no committed "
                            f"budget — add it to {os.path.basename(budget_path)}")
        elif scans > cap:
            failures.append(f"{q}: {scans} corpus scans > budget {cap}")
        elif scans < cap:
            if note:
                annotated.append(f"{q}: {scans} < budget {cap} ({note})")
            else:
                notes.append(f"{q}: {scans} < budget {cap} (tighten)")
    def probe_exempt(q):
        # Mirror of ReuseProbe --all's streaming exclusion.
        return q.startswith("q_stream") or \
            any(q.startswith(p) for p in ("q38", "q39", "q40", "q41", "q42"))
    stale = sorted(set(budget) - set(probe))
    for q in stale:
        if registry is not None and q in registry and not probe_exempt(q):
            failures.append(f"{q}: in budget AND in the registry but absent "
                            "from the probe output — ReuseProbe skipped it; "
                            "its replay regressions are unaudited")
        else:
            notes.append(f"{q}: in budget but not probed (removed query? drop it)")
    for a in annotated:
        print(f"scan_check OK (annotated): {a}")
    for n in notes:
        print(f"scan_check NOTE: {n}")
    if failures:
        for f in failures:
            print(f"scan_check FAIL: {f}")
        return 1
    print(f"scan_check OK: {len(probe)} queries within corpus-scan budget "
          f"({os.path.basename(budget_path)}, {len(annotated)} annotated)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
