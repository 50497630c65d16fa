#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with every
testdata table registered as a view, sorts columns by name, canonicalizes
values to strings, and diffs. Exit 0 iff all match.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Capability probe once up front (ADVICE r12): if the Arrow path is
    # unavailable (pyarrow absent / broken), the per-query skew probe
    # below would fail-closed ~200 times — one repeated WARN per query —
    # instead of one clear diagnostic. The skew check is load-bearing
    # (the driver hashes via Arrow), so a missing capability is a hard
    # FAIL, stated once.
    try:
        con.execute("SELECT 1 AS one").arrow()
    except Exception as e:
        print(f"check FAIL: arrow capability unavailable "
              f"(pyarrow missing/broken?): {e}")
        sys.exit(1)
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. localdata/sf1): a directory of parts.
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # On-format failure (ADVICE r12, same contract as scan_check/
    # stream_diff): a missing outDir or oracle_sql.json must emit the
    # tool's own 'check FAIL: ...' line, not a raw traceback. Fail-closed
    # either way — this only fixes the diagnostics.
    try:
        oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    except (OSError, ValueError) as e:
        print(f"check FAIL: oracle_sql.json unreadable "
              f"({out_dir}/oracle_sql.json): {e}")
        sys.exit(1)
    # A scoping name with no oracle entry must hard-fail (round-12
    # review): a typo'd query name — or a non-SQL-expressible query that
    # has no oracle — would otherwise report '0 passed, 0 failed' with
    # exit 0, a green result for a check that never ran.
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: no oracle_sql.json entry for: {sorted(unknown)} "
              "(typo, or a rows-only query with no DuckDB oracle)")
        sys.exit(1)
    failed, passed, skipped, skews = [], [], [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failed.append((name, "no spark output"))
            continue
        # Per-query fail-closed with the tool's own diagnostic (ADVICE
        # r12): a truncated/corrupt spark-output parquet is that query's
        # failure, not a traceback for the whole run.
        try:
            got_rel = con.execute(
                "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
        except Exception as e:
            failed.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            failed.append((name, f"oracle error: {e}"))
            continue
        if sorted(got_cols) != sorted(exp_cols):
            failed.append((name, f"cols: spark={sorted(got_cols)} duck={sorted(exp_cols)}"))
            continue
        # Arrow-type skew warning: the driver hashes via Arrow, where e.g.
        # DuckDB sum(BIGINT)=HUGEINT surfaces as decimal128(38,0) vs Spark's
        # int64 and hash-mismatches even when stringified values agree
        # (round-1 q27/q_from_json). Warn loudly so it is caught locally.
        try:
            got_schema = con.execute(
                "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files)
                + "]) LIMIT 0").arrow().schema
            # Subquery-wrap, don't suffix (round-12 review): 13 oracles
            # end in their own LIMIT n, so `<oracle> LIMIT 0` was a parse
            # error the old bare except swallowed — the skew probe had
            # silently never run for those queries. The wrap is
            # parse-safe for ORDER BY/LIMIT and WITH-CTE shapes alike.
            exp_schema = con.execute(
                f"SELECT * FROM ({oracle[name]}) AS _probe LIMIT 0"
            ).arrow().schema
            gt = {f.name: str(f.type) for f in got_schema}
            et = {f.name: str(f.type) for f in exp_schema}
            for c in sorted(gt):
                if c in et and gt[c] != et[c]:
                    print(f"WARN {name}: arrow type skew on '{c}': "
                          f"spark={gt[c]} duck={et[c]}")
                    skews.append((name, c, gt[c], et[c]))
        except Exception as e:
            # Fail closed (round-12 review): a probe that cannot run on
            # THIS oracle (SQL that breaks under the subquery wrap, a
            # per-file Arrow read error) is a skew check that did NOT
            # happen — the exact divergence class the driver's
            # Arrow-level hash fails on would pass silently if swallowed.
            # Environment-level capability (pyarrow itself) is probed
            # once up front, so this arm stays per-oracle (ADVICE r12).
            print(f"WARN {name}: arrow skew probe unavailable ({e})")
            skews.append((name, "<probe-error>", str(e), ""))
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(tuple(canon(r[i]) for i in gidx) for r in got)
        e = sorted(tuple(canon(r[i]) for i in eidx) for r in exp)
        if g == e:
            passed.append(name)
        else:
            msg = f"rows: spark={len(g)} duck={len(e)}"
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    msg += f"; first diff @ {i}:\n  spark={a}\n  duck ={b}"
                    break
            failed.append((name, msg))
    for n in passed:
        print(f"PASS {n}")
    for n, m in failed:
        print(f"FAIL {n}: {m}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    if skews:
        # Determinism canon: any result-type divergence is a gate failure
        # even when stringified values agree — the driver's Arrow-level
        # hash has mismatched on exactly this class (HUGEINT window sums,
        # round-8 q_cumulative_users). Cast one side until types align.
        print(f"{len(skews)} arrow type skew(s) — treat as FAIL "
              "(cast the oracle or the Spark column)")
    sys.exit(1 if (failed or skews) else 0)


if __name__ == "__main__":
    main()
