#!/usr/bin/env python3
"""Generate committed golden self-oracles (VERDICT r7 item 2).

Usage: python3 tools/golden_oracle.py <verifyOutDir> <query> [query ...]

For each named query, reads the graft.Verify parquet dump and prints a
DuckDB VALUES-table SELECT whose rows and arrow column types exactly
match the Spark output — suitable for embedding in
graft.queries.GoldenOracles so the driver's hash compare covers queries
DuckDB cannot recompute (ANN index paths, the BPE trainer, the
multimodal stub pipeline).

Only use for queries whose sf0.01 output is DETERMINISTIC — verify with
an A/B run first (different SPARK_GRAFT_CPUS, identical canonical rows).
The emitted SQL is valid for the dump's scale factor only.
"""
import sys, glob
import duckdb

ARROW_TO_DUCK = {
    "string": "VARCHAR", "large_string": "VARCHAR",
    "int64": "BIGINT", "int32": "INTEGER",
    "float": "FLOAT", "double": "DOUBLE", "bool": "BOOLEAN",
}


def lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # NaN/inf first (round-12 review): repr gives bare 'nan'/'inf'
        # tokens, which DuckDB binds as column references ("Referenced
        # column nan not found") — the special values need the quoted
        # cast form.
        if v != v:
            return "'NaN'::DOUBLE"
        if v == float("inf"):
            return "'Infinity'::DOUBLE"
        if v == float("-inf"):
            return "'-Infinity'::DOUBLE"
        # 'e0' forces DuckDB to parse as DOUBLE (correctly-rounded
        # string->double). A plain decimal literal becomes DECIMAL, and
        # DECIMAL->FLOAT can land 1 ulp off the Spark float32 value.
        r = repr(v)
        return r if "e" in r else r + "e0"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def main():
    out_dir = sys.argv[1]
    con = duckdb.connect()
    for q in sys.argv[2:]:
        files = sorted(glob.glob(f"{out_dir}/{q}/*.parquet"))
        if not files:
            sys.exit(f"no parquet under {out_dir}/{q}")
        src = "read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
        schema = con.execute(f"SELECT * FROM {src} LIMIT 0").arrow().schema
        cols = [f.name for f in schema]
        types = []
        for f in schema:
            t = ARROW_TO_DUCK.get(str(f.type))
            if t is None:
                sys.exit(f"{q}: no DuckDB mapping for arrow type {f.type} "
                         f"(column {f.name}) — extend ARROW_TO_DUCK")
            types.append(t)
        rows = con.execute(f"SELECT * FROM {src}").fetchall()
        # Zero rows would emit `FROM (VALUES )` — invalid SQL discovered
        # only at gate time (round-12 review). An empty deterministic
        # result is almost certainly a broken dump; fail here with the
        # fix path instead of printing a broken oracle.
        if not rows:
            sys.exit(f"{q}: dump has 0 rows — refusing to emit an empty "
                     "VALUES table (use a `SELECT ... WHERE 1=0` oracle "
                     "by hand if the query's correct output is empty)")
        # Deterministic row order in the emitted SQL (the compare sorts
        # anyway; this keeps regeneration diffs reviewable).
        rows = sorted(rows, key=lambda r: tuple(str(x) for x in r))
        sel = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
        vals = ",\n      ".join("(" + ", ".join(lit(v) for v in r) + ")"
                                for r in rows)
        print(f'    "{q}" -> """')
        print(f"      SELECT {sel}")
        print(f"      FROM (VALUES {vals}")
        print(f"      ) AS t({', '.join(cols)})\"\"\",")
        print()


if __name__ == "__main__":
    main()
