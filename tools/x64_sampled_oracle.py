#!/usr/bin/env python3
"""Sampled exact oracle for x64_record_linkage at SFs where the
definitional all-pairs DuckDB form is infeasible (quadratic in rows).

Picks K deterministic sample customers (md5 order), computes their TRUE
Hamming<=1 partner sets by scanning the full corpus (K x N, linear in N),
and asserts set-equality with the engine's pair output restricted to
pairs touching the sample. A wrong/missing/extra pair for any sampled id
fails loudly; K x N at K=1000, N=1.5M is ~1.5e9 length-gated comparisons
DuckDB handles in minutes, vs the infeasible N^2/2.

Usage: x64_sampled_oracle.py <verify_out_dir> <sf_dir> [K]
"""
import os
import sys

import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
k = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

con = duckdb.connect()
# Same knobs as check_oracle.py: spill dir always set (a big-SF run that
# needs to spill must not fall back to an in-memory DB's nowhere), thread
# cap optional.
con.execute("PRAGMA temp_directory='"
            + os.environ.get("GRAFT_ORACLE_SPILL_DIR", "/tmp/duck_spill")
            + "'")
if os.environ.get("GRAFT_ORACLE_THREADS"):
    con.execute(f"PRAGMA threads={int(os.environ['GRAFT_ORACLE_THREADS'])}")
con.execute(
    f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
con.execute(
    "CREATE VIEW engine AS SELECT * FROM "
    f"'{out_dir}/x64_record_linkage/*.parquet'")

# Deterministic md5-ordered sample, like the engine's own samplers.
con.execute(f"""
CREATE TABLE sample AS
SELECT c_custkey, c_name FROM customer
ORDER BY md5(CAST(c_custkey AS VARCHAR)) LIMIT {k}""")

# True partner set of each sampled id: levenshtein on equal-length names
# is Hamming here (substitutions only). K x N with a length gate.
# levenshtein is computed ONCE per length-gated row (in the inner
# projection) and the threshold filters on the alias — the dominant cost
# at K=1000 x N=1.5M, so it must not run twice per row on the chance
# DuckDB's CSE doesn't kick in.
con.execute("""
CREATE TABLE truth AS
SELECT a, b, dist FROM (
  SELECT least(s.c_custkey, c.c_custkey) AS a,
         greatest(s.c_custkey, c.c_custkey) AS b,
         levenshtein(s.c_name, c.c_name) AS dist
  FROM sample s JOIN customer c
    ON s.c_custkey <> c.c_custkey
   AND length(s.c_name) = length(c.c_name)
) WHERE dist <= 1""")

(truth_n,) = con.execute("SELECT count(DISTINCT (a, b)) FROM truth").fetchone()
(eng_n,) = con.execute("""
SELECT count(*) FROM engine e
WHERE e.a IN (SELECT c_custkey FROM sample)
   OR e.b IN (SELECT c_custkey FROM sample)""").fetchone()
(missing,) = con.execute("""
SELECT count(*) FROM (SELECT DISTINCT a, b FROM truth) t
WHERE NOT EXISTS (SELECT 1 FROM engine e WHERE e.a = t.a AND e.b = t.b)
""").fetchone()
(extra,) = con.execute("""
SELECT count(*) FROM engine e
WHERE (e.a IN (SELECT c_custkey FROM sample)
    OR e.b IN (SELECT c_custkey FROM sample))
  AND NOT EXISTS (SELECT 1 FROM truth t WHERE t.a = e.a AND t.b = e.b)
""").fetchone()
(distmm,) = con.execute("""
SELECT count(*) FROM engine e JOIN (SELECT DISTINCT a, b, dist FROM truth) t
  ON e.a = t.a AND e.b = t.b WHERE e.dist <> t.dist""").fetchone()

ok = missing == 0 and extra == 0 and distmm == 0 and eng_n == truth_n
print(f"[x64-sample] k={k} truth_pairs={truth_n} engine_pairs={eng_n} "
      f"missing={missing} extra={extra} dist_mismatch={distmm} "
      f"{'ok' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
