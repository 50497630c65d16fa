#!/usr/bin/env python3
"""Planted-regression drill for tools/scale_check.py (VERDICT r15 item 2).

Run by gate.sh BEFORE scale_check so every gate run proves the ledger
gate can actually fail — a checker that never fails is not evidence.
Builds doctored copies of a real committed record in a temp dir and
asserts each violation class exits nonzero with its FAIL line, then that
the clean copy passes:
  1. a planted bytes-exponent 1.2  -> super-linear FAIL
  2. scale.healthy flipped false   -> uncertified-evidence FAIL
  3. a planted -1 exponent         -> failed-at-one-dir FAIL
  4. one rep missing a query       -> two-rep-agreement FAIL
  5. untouched copies              -> OK
"""
import copy
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECK = os.path.join(REPO, "tools", "scale_check.py")
SRC = os.path.join(REPO, "bench_evidence",
                   "r15_third_decade_full_healthy.json")


def run(ledger):
    p = subprocess.run([sys.executable, CHECK, ledger],
                       capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def write(d, name, rec):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        json.dump(rec, f)
    return p


def ledger_for(d, files):
    p = os.path.join(d, "ledger.txt")
    with open(p, "w") as f:
        for path in files:
            f.write(f"drill {path}\n")
    return p


def expect(case, rc, out, want_rc, needle):
    ok = rc == want_rc and needle in out
    tag = "OK" if ok else "FAILED"
    print(f"scale_check_selftest {tag}: {case}")
    if not ok:
        print(f"  want rc={want_rc} containing {needle!r}, got rc={rc}:")
        print("  " + out.strip().replace("\n", "\n  "))
        sys.exit(1)


def main():
    base = json.load(open(SRC))
    with tempfile.TemporaryDirectory(prefix="graft-scale-drill-") as d:
        # Two clean reps (the agreement rule needs a multi-rep group).
        a = write(d, "rep_a.json", base)
        b = write(d, "rep_b.json", base)

        doc = copy.deepcopy(base)
        q = sorted(doc["scale"]["exponents_bytes"])[0]
        doc["scale"]["exponents_bytes"][q] = 1.2
        bad_exp = write(d, "bad_exp.json", doc)
        rc, out = run(ledger_for(d, [a, bad_exp]))
        expect("planted 1.2 exponent fails", rc, out, 1, "super-linear")

        doc = copy.deepcopy(base)
        doc["scale"]["healthy"] = False
        bad_h = write(d, "bad_health.json", doc)
        rc, out = run(ledger_for(d, [a, bad_h]))
        expect("healthy:false rep fails", rc, out, 1, "not probe-certified")

        doc = copy.deepcopy(base)
        doc["scale"]["exponents_bytes"][q] = -1.0
        bad_s = write(d, "bad_sentinel.json", doc)
        rc, out = run(ledger_for(d, [a, bad_s]))
        expect("-1 sentinel fails", rc, out, 1, "failed at one dir")

        doc = copy.deepcopy(base)
        del doc["scale"]["exponents_bytes"][q]
        sparse = write(d, "sparse.json", doc)
        rc, out = run(ledger_for(d, [a, sparse]))
        expect("single-rep query in a 2-rep group fails", rc, out, 1,
               "two-rep agreement not met")

        rc, out = run(ledger_for(d, [a, b]))
        expect("clean reps pass", rc, out, 0, "scale_check OK")
    print("scale_check_selftest OK: all 5 drill cases behave")


if __name__ == "__main__":
    main()
