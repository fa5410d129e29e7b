"""Quiet-host interleaved A/B for the two widest r9 bench spreads
(VERDICT r9 #5): token_count_byte_bpe (recorded 1.194 s vs its 0.91
gate, same-day quiet reads 0.907/1.009) and knn_batch100 (1.22x gate
while its numpy control sat at 0.71x).

Each flagged stage interleaves with its in-run control --
token_count_bpe (word-BPE, gate 0.61) and knn_batch100_numpy (gate
0.43) -- A B A B ... so host contention hits both sides equally; the
verdict reads off the A/B RATIO against the gate-row ratio, not the
absolute seconds.

Usage: python tools/ab_byte_bpe_knn.py [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from letsearch_spark.operators.topk import knn_join
    from letsearch_spark.session import get_spark
    from letsearch_spark.tokenizer import token_count_exact, train_bpe
    from letsearch_spark.tokenizer_bytebpe import (
        token_count_exact_bytebpe,
        train_byte_bpe,
    )

    spark = get_spark(
        "ab-bytebpe-knn", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bpe = train_bpe(docs, "text", vocab_size=2000)
    bb = train_byte_bpe(docs, "text", vocab_size=2000)

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base = emb.select(
        F.col("vec_id").alias("_key"), F.col("embedding").alias("vector")
    )
    qs = base.where(F.col("_key") < 100).select(
        F.col("_key").alias("query_id"), F.col("vector").alias("qvec")
    )

    stages = {
        "token_count_byte_bpe": lambda: token_count_exact_bytebpe(
            docs, "doc_id", "text", bb
        )
        .agg(F.sum("n_tokens"))
        .collect(),
        "token_count_bpe": lambda: token_count_exact(
            docs, "doc_id", "text", bpe
        )
        .agg(F.sum("n_tokens"))
        .collect(),
        "knn_batch100": lambda: knn_join(
            base, qs, k=10, method="expr"
        ).count(),
        "knn_batch100_numpy": lambda: knn_join(
            base, qs, k=10, method="numpy"
        ).count(),
    }
    for fn in stages.values():  # one untimed warmup each
        fn()

    times: dict[str, list[float]] = {k: [] for k in stages}
    for _ in range(args.repeats):  # strict interleave: A B A' B' ...
        for name, fn in stages.items():
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))

    out = {}
    for name, ts in times.items():
        out[name] = {
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "all": ts,
        }
    out["ratio_bytebpe_over_bpe"] = {
        "min": round(
            out["token_count_byte_bpe"]["min"] / out["token_count_bpe"]["min"],
            3,
        ),
        "gate": round(0.91 / 0.61, 3),
    }
    out["ratio_knn_over_numpy"] = {
        "min": round(
            out["knn_batch100"]["min"] / out["knn_batch100_numpy"]["min"], 3
        ),
        "gate": round(1.8 / 0.43, 3),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
