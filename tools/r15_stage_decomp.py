"""Stage-level decomposition of the heavy composite queries (guide §1):
time each pipeline stage in isolation with the noop sink, labeled jobs.

Usage: python tools/r15_stage_decomp.py [curation|ivfpq|minhash] ...
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, df, n=3):
    import statistics

    spark.sparkContext.setJobDescription(label)
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        xs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:45s} med={statistics.median(xs):7.3f}  min={min(xs):7.3f}  max={max(xs):7.3f}")


def curation(spark):
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

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang", "source")
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
    t(spark, "curation s1 blocklist", s1)

    flags = tx.gopher_quality(s1, keep_cols=["text", "lang"])
    s2l = flags.filter(
        F.col("ok_n_words") & F.col("ok_word_len") & F.col("ok_symbols") & F.col("ok_alpha")
    ).select("doc_id", "text", "lang")
    t(spark, "curation s2 gopher (lazy, no ckpt)", s2l)
    tA = time.perf_counter()
    s2 = s2l.localCheckpoint()
    print(f"{'curation s2 localCheckpoint (eager)':45s} one={time.perf_counter() - tA:7.3f}")

    keep3 = (
        ccnet_tertiles(s2)
        .filter(F.col("bucket") != "tail")
        .select(F.col("doc_id").alias("_k3"))
    )
    t(spark, "curation s3 ccnet keep-list", keep3)
    tA = time.perf_counter()
    s3 = s2.join(keep3, F.col("doc_id") == F.col("_k3")).drop("_k3").localCheckpoint()
    print(f"{'curation s3 join+ckpt (eager)':45s} one={time.perf_counter() - tA:7.3f}")

    cleaned = dd.exact_substring_dedup(s3.select("doc_id", "text"), k=8, min_count=2).select(
        "doc_id", "cleaned_text"
    )
    t(spark, "curation s4 substring dedup", cleaned)

    emb = load_table(spark, SF, "embeddings")
    emb_s = emb.join(
        s3.select(F.col("doc_id").alias("_k5")), F.col("vec_id") == F.col("_k5")
    ).drop("_k5")
    sd = sim.semdedup(emb_s, sim.cell_centroids(emb_s), tau=0.4)
    keep5 = sd.filter("keep").select(F.col("vec_id").alias("_kid"))
    t(spark, "curation s5 semdedup keep-list", keep5)

    final = (
        cleaned.join(keep5, F.col("doc_id") == F.col("_kid"))
        .drop("_kid")
        .join(
            s3.select(F.col("doc_id").alias("_kl"), "lang"),
            F.col("doc_id") == F.col("_kl"),
        )
        .drop("_kl")
    )
    with_tok = final.select("lang", "doc_id", tx.bpe_token_count("cleaned_text").alias("tok"))
    out = smp.token_shard_packing(
        with_tok, "tok", budget=4096, order_col="doc_id", key_cols=["lang"]
    )
    t(spark, "curation s6 full (pack incl. upstream)", out)


def ivfpq(spark):
    from pyspark.sql import functions as F

    from financedatabase_spark.operators import similarity as sim
    from financedatabase_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    tA = time.perf_counter()
    cen = sim.cell_centroids(emb).localCheckpoint()
    print(f"{'ivfpq centroids ckpt (eager)':45s} one={time.perf_counter() - tA:7.3f}")
    anchors = sim.residual_vectors(emb.filter(F.col("vec_id") < 8), cen)
    tA = time.perf_counter()
    cbs = sim.pq_codebooks(
        anchors.select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec")),
        m=8,
        dim=64,
    ).localCheckpoint()
    print(f"{'ivfpq codebooks ckpt (eager)':45s} one={time.perf_counter() - tA:7.3f}")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "label", "embedding")

    enc_corpus = sim.residual_vectors(corpus, cen, "label", "embedding")
    codes = sim.pq_encode(enc_corpus, cbs, 8, 64, id_col="corpus_id", vec_col="embedding", keep_cols=("label",))
    t(spark, "ivfpq pq_encode corpus", codes)

    full = sim.ivf_pq_topk(
        queries, corpus, cen, m=8, dim=64, k=5, n_probe=2,
        codebooks=cbs, residuals=True, rerank=20,
    )
    t(spark, "ivfpq full query (post-ckpt part)", full)


def minhash(spark):
    from financedatabase_spark.operators import dedup_docs as dd
    from financedatabase_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    sigs_in = docs.select("doc_id", "text")
    out = dd.minhash_lsh_dedup(sigs_in, threshold=0.5)
    t(spark, "minhash full", out)
    out2 = dd.simhash_near_dups(sigs_in, max_hamming=3)
    t(spark, "simhash full", out2)


def main():
    from financedatabase_spark.session import get_spark

    spark = get_spark("r15_stage_decomp")
    spark.range(1).count()
    which = sys.argv[1:] or ["curation", "ivfpq", "minhash"]
    for w in which:
        print(f"=== {w} @ {SF} ===")
        globals()[w](spark)


if __name__ == "__main__":
    main()
