"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full pipeline runs, nothing is
collected to the driver), after a small warm-up action so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from pandas_sigproc_spark.session import get_spark

HEADLINE = [
    # native relational tier
    "between",
    "between_freq",
    "deduplicate",
    "rms",
    "mov_rms",
    "integral",
    "derivative",
    "detrend_linear",
    "detrend_piecewise",
    "rss_daily",
    "rms_lin",
    "interp_daily",
    "segment_stats",
    # joins / classic relational
    "tpch_pricing",
    "tpch_revenue_join",
    "tpch_local_supplier",
    # kernel tier (applyInPandas)
    "filt_butter",
    "filt_chain",
    "psd_welch",
    "srs",
    "rainflow",
    # LLM-data-pipeline tier
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_jaccard_pairs",
    "dedup_embed",
    "doc_fingerprint",
    "lang_id",
    "embed_cosine_topk",
    "ann_lsh",
    "ann_ivf",
    "media_features",
    "corpus_prep",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cpus=cpus)

    qs = entry_mod.queries()
    # Warm-up: JVM, parquet footer reads, Python worker pool.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    qs["rms"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    # Spin up one Arrow-python worker per core so the first kernel-tier
    # query isn't billed for pool startup (one-time cost, not query cost).
    (
        spark.range(cpus, numPartitions=cpus)
        .groupBy("id")
        .applyInPandas(lambda p: p, "id long")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    # min of 3 runs per query: this host shows heavy neighbor-load jitter
    # (identical plans varying 10x minutes apart), and the min is the
    # standard estimator for the machine's actual capability.
    timings = {}
    for name in HEADLINE:
        fn = qs[name]
        best = None
        for rep in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            print(f"[bench] {name} rep{rep}: {el:.2f}s", file=sys.stderr, flush=True)
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
