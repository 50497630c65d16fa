#!/usr/bin/env python3
"""Behavior drill for scan_check.py's budget semantics (VERDICT r13
item 3): the aqe_empty_relation annotation must silence the standing
tighten-NOTE on a DELIBERATELY loose budget without weakening anything
else — a genuinely-loose un-annotated budget must still NOTE, an
overrun must still FAIL, and a malformed line must still FAIL. Runs in
the gate right before the real scan_check so the semantics are re-proven
mechanically every round, not trusted from the round they shipped.
"""
import os
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run_case(probe_lines, budget_lines, registry="[]"):
    with tempfile.TemporaryDirectory() as d:
        probe = os.path.join(d, "probe.log")
        budget = os.path.join(d, "budget.txt")
        reg = os.path.join(d, "registry.json")
        open(probe, "w").write("\n".join(probe_lines) + "\n")
        open(budget, "w").write("\n".join(budget_lines) + "\n")
        open(reg, "w").write(registry)
        p = subprocess.run(
            [sys.executable, os.path.join(TOOLS, "scan_check.py"),
             probe, budget, reg],
            capture_output=True, text=True)
        return p.returncode, p.stdout


def fail(msg, out):
    print(f"scan_check_selftest FAIL: {msg}\n--- scan_check output ---\n{out}")
    sys.exit(1)


def main():
    probe = ["q_under_annotated   corpus= 0 scratch= 0 reusedStages= 0 reusedNodes= 0",
             "q_under_plain       corpus= 1 scratch= 0 reusedStages= 0 reusedNodes= 0",
             "q_at_cap            corpus= 2 scratch= 0 reusedStages= 0 reusedNodes= 0"]

    # 1. Annotated loose budget: OK (annotated), zero NOTE lines, rc 0.
    rc, out = run_case(probe, ["q_under_annotated 2 aqe_empty_relation",
                               "q_under_plain 1", "q_at_cap 2"])
    if rc != 0:
        fail(f"annotated-loose case should pass (rc {rc})", out)
    if "OK (annotated): q_under_annotated: 0 < budget 2 (aqe_empty_relation)" \
            not in out:
        fail("annotated-loose case missing its OK (annotated) line", out)
    if "NOTE" in out:
        fail("annotated-loose case still printed a NOTE", out)

    # 2. Genuinely-loose un-annotated budget: the tighten-NOTE survives.
    rc, out = run_case(probe, ["q_under_annotated 2 aqe_empty_relation",
                               "q_under_plain 3", "q_at_cap 2"])
    if rc != 0:
        fail(f"loose-unannotated case should still pass (rc {rc})", out)
    if "NOTE: q_under_plain: 1 < budget 3 (tighten)" not in out:
        fail("loose-unannotated budget no longer NOTEs — annotation "
             "support weakened the tighten signal", out)

    # 3. Overrun on an ANNOTATED budget still fails — the annotation
    #    excuses looseness, never an overrun.
    rc, out = run_case(probe, ["q_under_annotated 2 aqe_empty_relation",
                               "q_under_plain 1", "q_at_cap 1 some_excuse"])
    if rc == 0 or "FAIL: q_at_cap: 2 corpus scans > budget 1" not in out:
        fail(f"overrun under an annotated budget must FAIL (rc {rc})", out)

    # 4. A 4-field budget line is malformed, not silently re-parsed.
    rc, out = run_case(probe, ["q_under_annotated 2 two annotations",
                               "q_under_plain 1", "q_at_cap 2"])
    if rc == 0 or "malformed" not in out:
        fail(f"4-field budget line must FAIL as malformed (rc {rc})", out)

    print("scan_check_selftest OK: annotated-loose silenced, plain-loose "
          "NOTEs, overrun FAILs, malformed FAILs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
