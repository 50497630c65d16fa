#!/usr/bin/env python3
"""Golden-oracle byte-identity drill (VERDICT r12 item 6).

  golden_drill.py <regen_output> [golden_scala]

<regen_output> is a captured run of tools/regen_goldens.sh (its "fresh
entries" section holds one VALUES-table entry per golden query, in
exactly the format committed in GoldenOracles.scala). This tool extracts
the per-query entry blocks from BOTH files and byte-compares them, so
golden drift — a fixture regen, a query change, a formatting change in
golden_oracle.py — is caught the round it happens instead of at the next
manual drill (the r12 drill was manual; gate.sh stage 2c runs this under
GATE_GOLDEN_DRILL=1).

Checks, fail-closed in the greppable one-line contract of the other gate
tools ('golden_drill FAIL: ...'):
- a query present in the scala file but absent from the regen output
  (regen silently skipped it) -> FAIL
- a query regenerated but not committed (new golden never pasted) -> FAIL
- any byte difference in the entry block -> FAIL with the first
  differing line
- zero entries parsed from either side (format drift in the emitter or
  this parser) -> FAIL
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# One full entry as golden_oracle.py prints it and GoldenOracles.scala
# commits it: four-space-indented `"name" -> """` through the closing
# `"""`,` — non-greedy DOTALL keeps each match to one entry.
# Name grammar is any \w+ to match regen_goldens.sh's own parse
# (round-13 review: a q-prefixed grammar here would silently exclude a
# future golden not named q* from the drift drill while the
# zero-entries guard stays satisfied by the others).
ENTRY = re.compile(r'^    "([\w]+)" -> """\n.*?"""',
                   re.MULTILINE | re.DOTALL)


def fail(msg):
    print(f"golden_drill FAIL: {msg}")
    sys.exit(1)


def entries(path, what):
    try:
        text = open(path).read()
    except OSError as e:
        fail(f"{what} unreadable ({path}): {e}")
    found = {m.group(1): m.group(0) for m in ENTRY.finditer(text)}
    if not found:
        fail(f"no golden entry blocks parsed from {what} ({path}) — "
             "emitter/parser format drift?")
    return found


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    scala = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "src/main/scala/graft/queries/GoldenOracles.scala")
    fresh = entries(sys.argv[1], "regen_output")
    committed = entries(scala, "golden_scala")
    failures = []
    for q in sorted(set(fresh) | set(committed)):
        if q not in fresh:
            failures.append(f"{q}: committed but absent from the regen "
                            "output — regen_goldens.sh skipped it")
        elif q not in committed:
            failures.append(f"{q}: regenerated but not committed in "
                            f"{os.path.basename(scala)}")
        elif fresh[q] != committed[q]:
            a, b = fresh[q].splitlines(), committed[q].splitlines()
            diff = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                        min(len(a), len(b)))
            failures.append(
                f"{q}: DRIFT — regenerated entry differs from committed "
                f"(first diff at block line {diff}); fixture regen or "
                "query change: re-run tools/regen_goldens.sh and paste")
        else:
            print(f"golden_drill OK {q}: byte-identical "
                  f"({len(committed[q])} chars)")
    if failures:
        for f in failures:
            print(f"golden_drill FAIL: {f}")
        return 1
    print(f"golden_drill OK: {len(committed)} goldens byte-identical "
          "to a fresh regeneration")
    return 0


if __name__ == "__main__":
    sys.exit(main())
