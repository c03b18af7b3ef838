#!/usr/bin/env python3
"""Scale-stress checker for the five Jaccard-oracle dedup queries.

The committed oracles (oracle_sql.json) keep the deliberately independent
O(n^2) all-pairs formulation; it is feasible at the driver's sf0.01 gate
but takes CPU-hours at sf0.1. This checker verifies the SAME exact-Jaccard
answer through the feasible inverted-index formulation (pairs sharing zero
shingles never meet), so the dedup family can be value-checked at 10x the
gate's scale in seconds.

Usage:
  sbt "runMain graft.Verify <sfDir> <outDir> dedup_ngram_jaccard|dedup_minhash_lsh|dedup_simhash|dedup_clusters|dedup_canonical"
  python3 tools/check_dedup_scale.py <sfDir> <outDir>
"""
import glob
import sys

import duckdb
import pandas as pd


def fast_pairs(thr: float) -> str:
    return f"""
sh AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        for i in range(1, len(w) - 1)]) AS s
       FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents) t),
sz AS (SELECT doc_id, len(s) AS sz FROM sh),
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT doc_a, doc_b,
       floor((inter::DOUBLE / (sa.sz + sb.sz - inter)) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= {thr})
"""


CLUSTER_TAIL = """
edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
reach(id, r) AS (SELECT s, s FROM edges
                 UNION SELECT e.s, reach.r FROM edges e JOIN reach ON reach.id = e.d),
lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
"""

QUALITY = """
  floor((0.3 * (length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE / length(text))
      + 0.3 * least(len(string_split_regex(trim(text), '\\s+'))::DOUBLE / 100.0, 1.0)
      + 0.4 * (len(list_distinct(string_split_regex(trim(text), '\\s+')))::DOUBLE
               / len(string_split_regex(trim(text), '\\s+')))) * 1000000 + 0.5) / 1000000
"""

ORACLES = {
    "dedup_ngram_jaccard":
        f"WITH {fast_pairs(0.8)} SELECT * FROM pairs ORDER BY doc_a, doc_b",
    "dedup_minhash_lsh":
        f"WITH {fast_pairs(0.8)} SELECT * FROM pairs ORDER BY doc_a, doc_b",
    "dedup_prefix_filter":
        f"WITH {fast_pairs(0.8)} SELECT * FROM pairs ORDER BY doc_a, doc_b",
    "dedup_simhash":
        f"WITH {fast_pairs(0.9)} SELECT * FROM pairs ORDER BY doc_a, doc_b",
    "dedup_clusters": f"""WITH RECURSIVE {fast_pairs(0.8)}, {CLUSTER_TAIL}
SELECT id AS doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS csize
FROM lab ORDER BY doc_id""",
    "dedup_canonical": f"""WITH RECURSIVE {fast_pairs(0.8)}, {CLUSTER_TAIL},
q AS (SELECT doc_id, {QUALITY} AS q FROM documents),
l AS (SELECT q.doc_id, q.q, COALESCE(lab.cluster_id, q.doc_id) AS cid
      FROM q LEFT JOIN lab ON lab.id = q.doc_id)
SELECT doc_id, canonical_id, doc_id = canonical_id AS kept FROM (
  SELECT doc_id, CAST(first_value(doc_id) OVER (
      PARTITION BY cid ORDER BY q DESC, doc_id) AS BIGINT) AS canonical_id
  FROM l) c ORDER BY doc_id""",
}


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    bad = 0
    for name, sql in ORACLES.items():
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"  ~ {name}: no Spark output, skipped")
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True))
        exp = norm(con.sql(sql).df())
        ok = (list(got.columns) == list(exp.columns)
              and len(got) == len(exp) and got.equals(exp))
        print(f"  {'OK ' if ok else 'BAD'} {name}: {len(got)} rows")
        bad += 0 if ok else 1
    print(f"== {len(ORACLES) - bad} ok, {bad} bad ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
