"""Stage decomposition of corpus_curation_pipeline_v2 (r16, verdict item 4).

Times every eager step of one build (the checkpoints ARE the stage
boundaries) plus the final packing job, with labeled job descriptions, so
the remaining cost attributes to a stage rather than to "the query".

Usage: python tools/r16_curation_decomp.py [sf_dir] [passes]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def timed_build(spark, sf_dir):
    from pyspark.sql import functions as F

    from financedatabase_spark.operators import dedup_docs as dd
    from financedatabase_spark.operators import sampling as smp
    from financedatabase_spark.operators import similarity as sim
    from financedatabase_spark.operators import text as tx
    from financedatabase_spark.operators.corrections import (
        domain_blocklist_dim,
        filter_blocked_domains,
        registrable_host,
    )
    from financedatabase_spark.operators.lm import ccnet_tertiles
    from financedatabase_spark.session import barrier
    from financedatabase_spark.sources.readers import load_table

    sc = spark.sparkContext
    marks = [("start", time.perf_counter())]

    def mark(lbl):
        marks.append((lbl, time.perf_counter()))
        sc.setJobDescription(None)

    sc.setJobDescription("curation: s1+s2 blocklist+gopher -> ckpt")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    urls = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 11 == 0, F.lit("cdn.")).otherwise(F.lit("www.")),
            F.col("source"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(".spamfarm.example")).otherwise(
                F.lit(".example.org")
            ),
            F.lit("/d/"),
            F.col("doc_id").cast("string"),
        ),
    ).withColumn("host", registrable_host(F.col("url")))
    bl = domain_blocklist_dim(
        spark, ["spamfarm.example", "src1.example.org", "www.src2.example.org"]
    )
    s1 = filter_blocked_domains(urls, bl, url_col="url", host_col="host").select(
        "doc_id", "text", "lang"
    )
    flags = tx.gopher_quality(s1, keep_cols=["text", "lang"])
    s2 = flags.filter(
        F.col("ok_n_words") & F.col("ok_word_len") & F.col("ok_symbols") & F.col("ok_alpha")
    ).select("doc_id", "text", "lang")
    s2 = barrier(s2)
    mark("s2 ckpt (blocklist+gopher)")

    sc.setJobDescription("curation: ccnet vocab train (collect)")
    keep3 = (
        ccnet_tertiles(s2)
        .filter(F.col("bucket") != "tail")
        .select(F.col("doc_id").alias("_k3"))
    )
    mark("ccnet build (vocab collect)")
    sc.setJobDescription("curation: s3 join -> ckpt")
    s3 = barrier(s2.join(keep3, F.col("doc_id") == F.col("_k3")).drop("_k3"))
    mark("s3 ckpt (ccnet keep join)")

    cleaned = dd.exact_substring_dedup(
        s3.select("doc_id", "text"), k=8, min_count=2
    ).select("doc_id", "cleaned_text")
    mark("substring dedup plan (lazy)")

    sc.setJobDescription("curation: semdedup build (centroid collect + assign ckpt)")
    emb = load_table(spark, sf_dir, "embeddings")
    emb_s = emb.join(
        s3.select(F.col("doc_id").alias("_k5")), F.col("vec_id") == F.col("_k5")
    ).drop("_k5")
    sd = sim.semdedup(emb_s, sim.cell_centroids(emb_s, dim=64), tau=0.4)
    keep5 = sd.filter("keep").select(F.col("vec_id").alias("_kid"))
    mark("semdedup build (collect + assign ckpt + guard)")

    sc.setJobDescription("curation: with_tok ckpt (substring dedup + semdedup joins)")
    final = (
        cleaned.join(keep5, F.col("doc_id") == F.col("_kid"))
        .drop("_kid")
        .join(
            s3.select(F.col("doc_id").alias("_kl"), "lang"),
            F.col("doc_id") == F.col("_kl"),
        )
        .drop("_kl")
    )
    with_tok = barrier(
        final.select("lang", "doc_id", tx.bpe_token_count("cleaned_text").alias("tok"))
    )
    mark("with_tok ckpt (dedup+semdedup execute)")

    sc.setJobDescription("curation: token shard packing (final job)")
    out = smp.token_shard_packing(
        with_tok, "tok", budget=4096, order_col="doc_id", key_cols=["lang"]
    )
    out.write.format("noop").mode("overwrite").save()
    mark("packing final job")
    sc.setJobDescription(None)
    return [(lbl, t1 - t0) for (lbl, t1), (_, t0) in zip(marks[1:], marks[:-1])]


def main():
    from financedatabase_spark.session import build_scope, get_spark

    spark = get_spark("r16_curation_decomp")
    spark.range(1).count()
    # warm at the smallest SF
    with build_scope(spark, "curation_decomp"):
        timed_build(spark, "/root/testdata/sf0.001")
    for p in range(PASSES):
        with build_scope(spark, "curation_decomp"):
            steps = timed_build(spark, SF)
        total = sum(t for _, t in steps)
        print(f"pass {p}: total {total:6.2f}s")
        for lbl, t in steps:
            print(f"    {lbl:48s} {t:7.3f}")


if __name__ == "__main__":
    main()
