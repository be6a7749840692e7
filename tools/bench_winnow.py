"""Winnowing fingerprint hash-path micro-bench: md5 (oracle baseline)
vs xxhash64 (BIGINT scale path) over the documents table.

The fingerprint stage is a pure scan (zero shuffle), so this isolates
exactly the cost the hash mode changes: per-gram hashing plus the w-1
element-wise `least()` passes of the sliding-window min (32-byte
lexicographic string compares vs primitive long compares).

The stock documents table is tiny (~50-word docs), so the tool scales
it to a corpus-shaped workload in-flight: each doc is replicated
``copies`` times (distinct ids) with its text repeated ``text_repeat``
times (~200-word docs) — the per-gram hash cost is what's being
measured and is invariant to the synthetic content.

Usage: python tools/bench_winnow.py [sf_dir] [reps] [copies] [text_repeat]
       (default /root/testdata/sf0.1 = 10x the correctness scale,
       3 reps, 100 copies, 4x text -> ~500k docs x ~200 words; prints
       one JSON line with per-mode medians + the speedup)
"""
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 100
TEXT_REPEAT = int(sys.argv[4]) if len(sys.argv) > 4 else 4

from pyspark.sql import functions as F  # noqa: E402

from financedatabase_spark.operators.text import with_winnow_fingerprints  # noqa: E402
from financedatabase_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("bench-winnow")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    docs = (
        docs.select("doc_id", "text")
        .withColumn("_c", F.explode(F.sequence(F.lit(1), F.lit(COPIES))))
        .select(
            (F.col("doc_id") * COPIES + F.col("_c")).alias("doc_id"),
            F.concat_ws(" ", F.array_repeat(F.col("text"), TEXT_REPEAT)).alias("text"),
        )
        .repartition(32)
        .localCheckpoint()  # exclude scan IO + the synthetic blow-up
    )

    def run(mode: str) -> float:
        # sum of set sizes forces every fingerprint to materialize; the
        # query is REBUILT per rep — re-collecting one DataFrame object
        # skips the map stage via shuffle-output reuse (measured 0.03s
        # "runs" otherwise)
        def q():
            return (
                with_winnow_fingerprints(docs, "text", "_fp", hash_mode=mode)
                .select(F.size("_fp").alias("n")).agg(F.sum("n"))
            )
        q().collect()  # warm (codegen + JIT)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            q().collect()
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    n_docs = docs.count()
    md5_s = run("md5")
    xx_s = run("xxhash64")
    print(json.dumps({
        "metric": "winnow_fingerprint_scan",
        "sf_dir": SF,
        "n_docs": n_docs,
        "md5_sec": round(md5_s, 3),
        "xxhash64_sec": round(xx_s, 3),
        "speedup": round(md5_s / xx_s, 2),
        "unit": "sec",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
