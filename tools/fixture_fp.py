#!/usr/bin/env python3
"""Fingerprint the driver's testdata fixtures (VERDICT r8 item 6).

Usage: python3 tools/fixture_fp.py [sfDir ...]   (default: sf0.01 sf0.1)

Prints one line per dir: `<dir> <md5-of-file-digests>` where the digest
covers every parquet file's name, size, and content md5 — stable across
mtime-only touches, changed by any content regen. The gate records the
fingerprint at start, re-checks it after the (long) test+bench phases,
and fails if the driver regenerated fixtures mid-gate, which has
happened twice (r7 noise flag, r8 q31 adjudication).
"""
import hashlib, os, sys


def fp(d):
    h = hashlib.md5()
    # Determinism comes from the outer sorted() over the EXHAUSTED walk —
    # an in-loop dirs.sort() would be dead code here (the generator is
    # already consumed) and must not be mistaken for the ordering
    # mechanism (round-12 review).
    for root, dirs, files in sorted(os.walk(d)):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            h.update(os.path.relpath(p, d).encode())
            h.update(str(os.path.getsize(p)).encode())
            with open(p, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
    return h.hexdigest()


def doc_id_unique(d):
    """documents.doc_id must be row-unique (ADVICE r15): q_ngram_novelty's
    map-side array_distinct replaced a global distinct(), so duplicate
    doc_id rows would silently inflate its n_ngrams/novelty counts in any
    fixture the oracle gate doesn't cover. Checked here because the gate
    already runs this script against every fixture it trusts. Reported on
    stderr + exit code so the stdout fingerprint contract (committed as
    FIXTURES_FP.txt) is unchanged. Returns True when unique or absent."""
    p = os.path.join(d, "documents.parquet")
    if not os.path.exists(p):
        return True
    import pyarrow.parquet as pq
    if os.path.isdir(p):
        import glob as g
        files = sorted(g.glob(os.path.join(p, "*.parquet")))
    else:
        files = [p]
    import pyarrow as pa
    cols = [pq.read_table(f, columns=["doc_id"]).column("doc_id")
            for f in files]
    ids = pa.concat_arrays([c.combine_chunks() for c in cols])
    n, nd = len(ids), len(ids.unique())
    if n != nd:
        print(f"fixture_fp FAIL: {p} has {n} rows but {nd} distinct "
              "doc_id — q_ngram_novelty's per-doc dedup precondition is "
              "violated", file=sys.stderr)
        return False
    return True


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    ok = True
    for d in dirs:
        print(f"{d} {fp(d) if os.path.isdir(d) else 'MISSING'}")
        ok = doc_id_unique(d) and ok
    if not ok:
        sys.exit(1)
