#!/usr/bin/env python3
"""Bit-for-bit equivalence check between two streaming-sink output dirs.

Used by the kill-and-restart recovery rehearsal: a run killed mid-stream
(kill -9) and restarted from its checkpoint must produce exactly the same
final output as an uninterrupted run — the file sink's exactly-once
contract. Reads both parquet dirs (the file sink's _spark_metadata commit
log governs which files are VISIBLE, but a hard kill can leave orphaned
uncommitted part-files; reading the raw glob would wrongly count them, so
rows are read through the per-file list in _spark_metadata when present).

Usage: stream_output_diff.py <outDirA> <outDirB>
Exit 0 iff row-multiset-identical (column-sorted, row-sorted, exact).
"""
import glob
import json
import os
import sys
import urllib.parse

import duckdb


def committed_files(out_dir):
    meta = os.path.join(out_dir, "_spark_metadata")
    if not os.path.isdir(meta):
        return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    files = set()
    for log in sorted(glob.glob(os.path.join(meta, "*")),
                      key=lambda p: os.path.basename(p)):
        if os.path.basename(log).endswith(".compact") or \
                os.path.basename(log).isdigit():
            with open(log) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("v"):
                        continue
                    entry = json.loads(line)
                    if "path" in entry:
                        # SinkFileStatus records a URI ("file:/out%20dir/
                        # part-...") — strip the scheme AND percent-decode,
                        # or any escaped char breaks read_parquet
                        u = urllib.parse.urlparse(entry["path"])
                        files.add(urllib.parse.unquote(u.path))
    return sorted(files)


def fingerprint(con, out_dir):
    files = committed_files(out_dir)
    if not files:
        return 0, None
    lst = ", ".join(f"'{f}'" for f in files)
    rel = con.sql(f"SELECT * FROM read_parquet([{lst}])")
    cols = sorted(rel.columns)
    # Unambiguous per-row encoding: concat_ws SKIPS NULLs (so (x, NULL)
    # and (NULL, x) would collide) and data may contain the delimiter —
    # encode each column as a length-prefixed coalesced string instead,
    # which no value can forge.
    sel = " || ".join(
        f"concat(length(coalesce(cast({c} AS VARCHAR), '')), "
        f"CASE WHEN {c} IS NULL THEN 'N:' ELSE 'V:' END, "
        f"coalesce(cast({c} AS VARCHAR), ''))" for c in cols)
    n, h = con.sql(
        f"SELECT count(*), md5(string_agg(r, '|' ORDER BY r)) FROM ("
        f"SELECT {sel} AS r FROM read_parquet([{lst}]))"
    ).fetchone()
    return n, h


a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
na, ha = fingerprint(con, a)
nb, hb = fingerprint(con, b)
same = na == nb and ha == hb
print(f"[stream-diff] A rows={na} md5={ha}")
print(f"[stream-diff] B rows={nb} md5={hb}")
print(f"[stream-diff] {'IDENTICAL' if same else 'MISMATCH'}")
sys.exit(0 if same else 1)
