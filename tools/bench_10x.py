"""Headline queries at 10x: Spark engine vs DuckDB oracle, one timed run
each after a small-SF warm pass. DuckDB runs per-query in a subprocess
with a hard cap (its recursive-CTE bar oracles are superlinear at 10x).
Produces the numbers in SCALE.md's 10x ratio table.

Usage: python tools/bench_10x.py [sf1x_dir] [query ...]   (default
       /tmp/sf1x + the full HEADLINE list; build the dataset first with
       tools/make_10x.py — e.g. the 50x crossover run passes /tmp/sf5x
       and the six fixed-floor queries)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
DUCK_CAP_S = int(os.environ.get("BENCH10X_DUCK_CAP", "600"))

_DUCK_SNIPPET = r'''
import sys, time, json, duckdb
sys.path.insert(0, sys.argv[2])
from financedatabase_spark.plans.registry import ORACLE_SQL
con = duckdb.connect(); con.execute("SET threads TO 32")
con.execute("SET enable_progress_bar=false")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '" + sys.argv[3] + f"/{t}.parquet'")
t0 = time.perf_counter()
rows = con.execute(ORACLE_SQL[sys.argv[1]]).fetchall()
print("RESULT " + json.dumps([round(time.perf_counter()-t0, 2), len(rows)]))
'''


def main() -> None:
    from bench import HEADLINE
    from financedatabase_spark.plans.registry import QUERIES
    from financedatabase_spark.session import get_spark

    names = sys.argv[2:] or HEADLINE

    spark = get_spark("bench10x")
    spark.range(1).count()
    warm = os.path.join(os.path.dirname(SF.rstrip("/")), "sf0.001")
    warm = warm if os.path.isdir(warm) else "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm).count()
        except Exception:
            pass

    engine = {}
    for name in names:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, SF).count()
        engine[name] = [round(time.perf_counter() - t0, 2), n]
        print("spark", name, engine[name], flush=True)
    spark.stop()

    duck = {}
    for name in names:
        try:
            r = subprocess.run(
                [sys.executable, "-c", _DUCK_SNIPPET, name, REPO, SF],
                capture_output=True, text=True, timeout=DUCK_CAP_S,
            )
            res = ["err", (r.stderr or "no output")[-200:]]
            for line in r.stdout.splitlines():
                if line.startswith("RESULT "):
                    res = json.loads(line[7:])
            duck[name] = res
        except subprocess.TimeoutExpired:
            duck[name] = [f">{DUCK_CAP_S}", None]
        print("duck", name, duck[name], flush=True)

    print(json.dumps({"sf_dir": SF, "engine": engine, "duckdb": duck}))


if __name__ == "__main__":
    main()
