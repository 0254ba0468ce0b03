#!/usr/bin/env python3
"""Synthesize an N-times scale-up of a testdata dir for scale-honesty
bench runs (builder-side tooling only — not part of the shipped library).

Usage: python3 tools/scale_up.py <srcDir> <dstDir> [factor=10]

Each copy k offsets the id spaces (event_id, user_id, doc_id, vec_id)
into disjoint ranges and perturbs text/vectors deterministically so
dedup-family operators see realistic near-duplicate structure (10-copy
groups) instead of one degenerate mega-cluster of bit-identical rows.
Timestamps are left unchanged: series count and time span stay fixed
while row volume scales, which is the interesting regime for the store
and window tiers (same key cardinality, 10x data per key).
"""
import os
import sys

import duckdb

def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    def copy(sql, name):
        duckdb.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = duckdb.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # value-perturbation step: the per-bucket MEAN shifts by
    # mean(i)*step = (k-1)/2*step, and window means are value-oracled
    # with round(.,6) on both engines — a step of 1e-6 put the k=100
    # mean offset at exactly 49.5e-6, parking true means on the
    # round-half boundary where one-ULP summation-order differences
    # between engines round opposite ways (a 100x-only red herring).
    # 2e-6 keeps every k's mean offset to >= 6 exact decimals.
    copy(f"""
        SELECT event_id + i * 100000000 AS event_id, ts,
               user_id + i * 10000000 AS user_id, event_type,
               value + i * 0.000002 AS value, props
        FROM '{src}/events.parquet' CROSS JOIN range({k}) t(i)
        """, "events")
    copy(f"""
        SELECT doc_id + i * 10000000 AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' copytok' || CAST(i AS VARCHAR) END AS text,
               lang, source, n_chars
        FROM '{src}/documents.parquet' CROSS JOIN range({k}) t(i)
        """, "documents")
    copy(f"""
        SELECT vec_id + i * 10000000 AS vec_id,
               list_transform(embedding,
                 x -> CAST(x + i * 0.001 AS FLOAT)) AS embedding,
               label
        FROM '{src}/embeddings.parquet' CROSS JOIN range({k}) t(i)
        """, "embeddings")
    # the TPC-H FACTS scale too (order keys offset in lockstep so the
    # lineitem<->orders join stays consistent; dimension foreign keys
    # pass through, so dims keep their cardinality and every dim key
    # simply owns k-times the fact rows — the realistic fact-growth
    # regime the TPC-H scale-honesty runs need). The stride derives
    # from the source's actual max key: a hard-coded constant would
    # collide replica ranges once base orderkeys pass it (TPC-H max
    # orderkey = 6M*sf, so sf >= ~17 breaks a fixed 1e8 stride).
    stride = duckdb.sql(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    copy(f"""
        SELECT o_orderkey + i * {stride} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet' CROSS JOIN range({k}) t(i)
        """, "orders")
    copy(f"""
        SELECT l_orderkey + i * {stride} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet' CROSS JOIN range({k}) t(i)
        """, "lineitem")
    # the dimension tables pass through unscaled
    for tbl in ("region", "nation", "customer", "supplier", "part"):
        p = f"{src}/{tbl}.parquet"
        if os.path.exists(p):
            duckdb.sql(f"COPY (SELECT * FROM '{p}') TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")

if __name__ == "__main__":
    main()
