#!/usr/bin/env bash
# Golden-oracle refresh after a driver fixture regen (detected by the
# gate's fixture fingerprint check, tools/fixture_fp.py).
#
# The committed golden oracles in GoldenOracles.scala embed sf0.01
# results for queries DuckDB cannot recompute (ANN index paths, BPE
# trainer, multimodal stub, MinHash-LSH pairs). They are valid for one
# fixture generation; when the driver regenerates testdata, this script
# re-derives them with the required A/B determinism evidence:
#
#   1. dump each golden query at local[4] AND local[32]
#   2. fail unless the canonical outputs are bit-identical (a
#      nondeterministic query must NOT get a golden oracle)
#   3. print fresh VALUES-table entries to paste into GoldenOracles.scala
#
# Usage: tools/regen_goldens.sh [sfDir]     (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
# One source of truth (round-12 review): derive the golden-query list
# from GoldenOracles.scala itself — a hardcoded copy here silently
# skipped any future golden at regen time, leaving it stale until the
# gate hash-FAILed with no hint the regen was incomplete.
mapfile -t GOLDEN_QUERIES < <(
  grep -oE '^\s*"[^"]+" -> """' src/main/scala/graft/queries/GoldenOracles.scala \
    | sed -E 's/^\s*"([^"]+)".*/\1/')
if [[ ${#GOLDEN_QUERIES[@]} -eq 0 ]]; then
  echo "regen_goldens FAIL: no golden keys parsed from GoldenOracles.scala" >&2
  exit 1
fi
echo "golden queries (from GoldenOracles.scala): ${GOLDEN_QUERIES[*]}"

rm -rf /tmp/golden_a /tmp/golden_b
SPARK_GRAFT_CPUS=4  sbt -batch "runMain graft.Verify $SF /tmp/golden_a ${GOLDEN_QUERIES[*]}" > /tmp/golden_a.log 2>&1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF /tmp/golden_b ${GOLDEN_QUERIES[*]}" > /tmp/golden_b.log 2>&1

# argv[1:] is the query list — the A/B dirs are the fixed /tmp paths the
# dump step above just wrote (round-12 review: $SF was passed but unused,
# reading as if the compare were parameterized by scale dir).
python3 - "${GOLDEN_QUERIES[@]}" <<'EOF'
import duckdb, glob, sys
con = duckdb.connect()
def canon(d, q):
    files = sorted(glob.glob(f"{d}/{q}/*.parquet"))
    if not files:
        sys.exit(f"{q}: no output under {d} — Verify failed? see /tmp/golden_*.log")
    src = "read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    rel = con.execute(f"SELECT * FROM {src}")
    cols = sorted(range(len(rel.description)), key=lambda i: rel.description[i][0])
    return sorted(tuple(str(r[i]) for i in cols) for r in rel.fetchall())
for q in sys.argv[1:]:
    a, b = canon("/tmp/golden_a", q), canon("/tmp/golden_b", q)
    if a != b:
        sys.exit(f"A/B FAIL: {q} differs between local[4] and local[32] — "
                 "NOT golden-oracle-able; fix the nondeterminism first")
    print(f"A/B OK {q}: {len(a)} rows identical across cpu counts")
EOF

echo
echo "== fresh entries (paste into GoldenOracles.scala, update Scaladoc) =="
python3 tools/golden_oracle.py /tmp/golden_b "${GOLDEN_QUERIES[@]}"
