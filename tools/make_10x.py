"""Build a 10x (sf1-equivalent) dataset from sf0.1 for scale testing.

Ten key/time-shifted copies: surrogate keys offset per copy so key
cardinality scales 10x (new users, orders, docs, vectors), timestamps
offset 30 days per copy so the time axis grows instead of densifying.
Embedding cluster LABELS are offset per copy too (stride 1000 > the
base label domain), so cluster count scales with the corpus — the
SemDeDup/IVF regime the papers assume (~100k clusters at web scale);
a fixed label set would make every per-cluster pass quadratic in the
copy count by construction. Each copy's vectors also get a small
first-component shift (i * 0.01): byte-identical replicas would give
every base cluster 50 IDENTICAL centroids, and the deterministic
min-label tie-break would collapse the whole corpus back onto copy
0's 10 clusters — the shift keeps every copy's centroid distinct at
the 1e-6 assignment rounding. This is the dataset behind SCALE.md's
10x/50x ratio tables.

Usage: python tools/make_10x.py [src_dir] [dst_dir] [copies]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1x, 10 copies;
       pass copies=50 + dst=/tmp/sf5x for the 50x crossover table)
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SHIFTS = {
    "events": """
      SELECT event_id + {i}*10000000 AS event_id,
             ts + INTERVAL ({i}*30) DAY AS ts,
             user_id + {i}*100000 AS user_id,
             event_type, value, props FROM {src}""",
    "documents": """
      SELECT doc_id + {i}*1000000 AS doc_id, text, lang, source, n_chars FROM {src}""",
    "embeddings": """
      SELECT vec_id + {i}*1000000 AS vec_id,
             list_prepend(embedding[1] + {i} * 0.01e0,
                          embedding[2:])::FLOAT[] AS embedding,
             label + {i}*1000 AS label FROM {src}""",
    "customer": """
      SELECT c_custkey + {i}*1000000 AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment FROM {src}""",
    "orders": """
      SELECT o_orderkey + {i}*10000000 AS o_orderkey,
             o_custkey + {i}*1000000 AS o_custkey,
             o_orderstatus, o_totalprice,
             o_orderdate + INTERVAL ({i}*30) DAY AS o_orderdate,
             o_orderpriority FROM {src}""",
    "lineitem": """
      SELECT l_orderkey + {i}*10000000 AS l_orderkey,
             l_partkey + {i}*1000000 AS l_partkey,
             l_suppkey + {i}*100000 AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus,
             l_shipdate + INTERVAL ({i}*30) DAY AS l_shipdate FROM {src}""",
    "part": """
      SELECT p_partkey + {i}*1000000 AS p_partkey, p_name, p_brand, p_type,
             p_size, p_retailprice FROM {src}""",
    "supplier": """
      SELECT s_suppkey + {i}*100000 AS s_suppkey, s_name, s_nationkey,
             s_acctbal FROM {src}""",
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for table, tpl in SHIFTS.items():
        src = f"'{SRC}/{table}.parquet'"
        union = " UNION ALL ".join(tpl.format(i=i, src=src) for i in range(COPIES))
        con.execute(f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(table, n)
    for t in ("region", "nation"):  # dims stay dims
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")


if __name__ == "__main__":
    main()
