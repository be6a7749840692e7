"""A/B: corpus_curation_pipeline_v2 as committed vs with a localCheckpoint
barrier on with_tok (lang, doc_id, tok — one row per surviving doc)
before token_shard_packing, whose two prefix-sum consumers otherwise
re-execute the whole upstream subtree when AQE stage reuse does not
fire. Also times each eager build step.

Usage: python tools/r15_curation_barrier.py [passes]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, sf_dir, barrier: bool, log=False):
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
    from financedatabase_spark.sources.readers import load_table

    marks = [("start", time.perf_counter())]

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
    marks.append(("plan to s2", time.perf_counter()))
    s2 = s2.localCheckpoint()
    marks.append(("s2 ckpt job", time.perf_counter()))

    keep3 = (
        ccnet_tertiles(s2)
        .filter(F.col("bucket") != "tail")
        .select(F.col("doc_id").alias("_k3"))
    )
    marks.append(("ccnet build (vocab collect)", time.perf_counter()))
    s3 = s2.join(keep3, F.col("doc_id") == F.col("_k3")).drop("_k3").localCheckpoint()
    marks.append(("s3 join+ckpt job", time.perf_counter()))

    cleaned = dd.exact_substring_dedup(
        s3.select("doc_id", "text"), k=8, min_count=2
    ).select("doc_id", "cleaned_text")
    marks.append(("substring dedup plan", time.perf_counter()))

    emb = load_table(spark, sf_dir, "embeddings")
    emb_s = emb.join(
        s3.select(F.col("doc_id").alias("_k5")), F.col("vec_id") == F.col("_k5")
    ).drop("_k5")
    sd = sim.semdedup(emb_s, sim.cell_centroids(emb_s, dim=64), tau=0.4)
    keep5 = sd.filter("keep").select(F.col("vec_id").alias("_kid"))
    marks.append(("semdedup build (collect+ckpt)", time.perf_counter()))

    final = (
        cleaned.join(keep5, F.col("doc_id") == F.col("_kid"))
        .drop("_kid")
        .join(
            s3.select(F.col("doc_id").alias("_kl"), "lang"),
            F.col("doc_id") == F.col("_kl"),
        )
        .drop("_kl")
    )
    with_tok = final.select(
        "lang", "doc_id", tx.bpe_token_count("cleaned_text").alias("tok")
    )
    if barrier:
        with_tok = with_tok.localCheckpoint()
        marks.append(("with_tok ckpt job", time.perf_counter()))
    out = smp.token_shard_packing(
        with_tok, "tok", budget=4096, order_col="doc_id", key_cols=["lang"]
    )
    marks.append(("packing plan", time.perf_counter()))
    if log:
        for (lbl, t1), (_, t0) in zip(marks[1:], marks[:-1]):
            print(f"    {lbl:35s} {t1 - t0:7.3f}")
    return out


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from financedatabase_spark.session import get_spark

    spark = get_spark("r15_curation_barrier")
    spark.range(1).count()
    for barrier in (False, True):
        build(spark, "/root/testdata/sf0.001", barrier).write.format("noop").mode(
            "overwrite"
        ).save()
    for i in range(passes):
        for barrier in (False, True):
            t0 = time.perf_counter()
            df = build(spark, SF, barrier, log=(i == passes - 1))
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"pass {i} barrier={barrier}: build={t1-t0:7.3f}  "
                f"materialize={t2-t1:7.3f}  total={t2-t0:7.3f}"
            )


if __name__ == "__main__":
    main()
