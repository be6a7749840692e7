"""Split corpus_curation_pipeline_v2's wall time into plan-BUILD (the
query function call: plan construction + its eager jobs — two
localCheckpoints, the CCNet vocab collect, the SemDeDup centroid
collect) and MATERIALIZE (the final noop write), per guide §1. Then dump
the executed (post-AQE) plan of the final job to check exchange reuse.

Usage: python tools/r15_curation_split.py [passes]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from financedatabase_spark.plans.registry import QUERIES
    from financedatabase_spark.session import get_spark

    spark = get_spark("r15_curation_split")
    spark.range(1).count()
    q = QUERIES["corpus_curation_pipeline_v2"]
    # warm at sf0.001 like bench.py
    df = q(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()

    last = None
    for i in range(passes):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"curation build pass {i}")
        df = q(spark, SF)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"curation materialize pass {i}")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(f"pass {i}: build={t1-t0:7.3f}  materialize={t2-t1:7.3f}  total={t2-t0:7.3f}")
        last = df
    spark.sparkContext.setJobDescription(None)

    plan = last._jdf.queryExecution().executedPlan().toString()
    n_reused = plan.count("ReusedExchange")
    n_mip = plan.count("MapInPandas")
    print(f"final executed plan: ReusedExchange={n_reused} MapInPandas={n_mip}")
    with open("/tmp/curation_final_plan.txt", "w") as f:
        f.write(plan)


if __name__ == "__main__":
    main()
