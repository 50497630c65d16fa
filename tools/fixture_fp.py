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


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for d in dirs:
        print(f"{d} {fp(d) if os.path.isdir(d) else 'MISSING'}")
