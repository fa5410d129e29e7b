"""Measure the grouped-MaxSim prefilter crossover (r10, after the
pooled-centroid sidecar landed -- VERDICT r9 #1/#6).

Builds stub collections over xN copies of the sf0.1 documents table
(scale_probe's salted-copy scheme), groups chunks ~8 per synthetic
group, and times the BATCHED serving path (search_many_multi, 10
two-vector queries) exact vs prefilter_k in {8, 32, 128}, with
recall@10 of each against exact and the one-time sidecar build cost
reported separately. Results feed SCALING.md's r10 table and the
resolve rule behind search_multi(prefilter_k='auto').

Usage: python tools/measure_maxsim_prefilter.py [--scales 1,4,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--ks", default="8,32,128")
    ap.add_argument("--queries", type=int, default=10)
    ap.add_argument("--chunks-per-group", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from letsearch_spark import get_spark
    from letsearch_spark.collection import Collection
    from tools.scale_probe import scaled_docs

    spark = get_spark(
        "maxsim-prefilter",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    many_sets = [
        [f"spark join {i}", f"window batch {i}"] for i in range(args.queries)
    ]

    def topk_ids(df):
        rows = df.collect()
        # (query_id, rank-ordered group list)
        out = {}
        for r in rows:
            out.setdefault(r["query_idx"], []).append(r["group"])
        return out

    def recall(approx, exact):
        num = den = 0
        for q, want in exact.items():
            got = set(approx.get(q, []))
            num += len(got & set(want))
            den += len(want)
        return num / den if den else 1.0

    for n in [int(s) for s in args.scales.split(",")]:
        docs = scaled_docs(spark, n)
        n_docs = docs.count()
        n_groups = max(n_docs // args.chunks_per_group, 1)
        docs = docs.select(
            "text", (F.col("doc_id") % n_groups).cast("string").alias("grp")
        )
        root = tempfile.mkdtemp(prefix=f"ls_pf_x{n}_")
        coll = Collection.create(
            spark,
            root,
            name="pf",
            index_columns=["text"],
            model_name="stub://16",
        )
        coll.import_df(docs)
        coll.embed_all()
        coll.serve_filter_columns = ["grp"]

        row = {"copies": n, "chunks": n_docs, "groups": n_groups}

        # warm the serve cache out of the comparison, then exact.
        # r10-optimization methodology fix: each cell is WARMED (one
        # untimed same-shape call compiles the plan) and reported as
        # min-of-2 -- the original single-shot cells mixed multi-second
        # first-call plan/codegen work into the serving numbers and
        # briefly faked an inverted crossover at x16 (13.6 s single-shot
        # vs 2.9 s warmed min; OPTIMIZATION_r10.md).
        def timed_min2(mk):
            mk().count()  # warm: compile this plan shape
            best = None
            for _ in range(2):
                t0 = time.time()
                out = topk_ids(mk())
                dt = time.time() - t0
                if best is None or dt < best[0]:
                    best = (dt, out)
            return round(best[0], 2), best[1]

        row["exact_s"], exact = timed_min2(
            lambda: coll.search_many_multi(
                "text", many_sets, limit=10, group_col="grp"
            )
        )

        # one-time sidecar build, reported separately (index cost, not
        # serving cost -- the hamming-refresh precedent)
        t0 = time.time()
        coll.refresh_maxsim_pool_index("text", "grp")
        coll._maxsim_pool_view("text", "grp")
        row["sidecar_build_s"] = round(time.time() - t0, 2)

        for k in [int(s) for s in args.ks.split(",")]:
            row[f"pf{k}_s"], approx = timed_min2(
                lambda k=k: coll.search_many_multi(
                    "text", many_sets, limit=10, group_col="grp",
                    prefilter_k=k,
                )
            )
            row[f"pf{k}_recall"] = round(recall(approx, exact), 3)

        print(json.dumps(row))

    spark.stop()


if __name__ == "__main__":
    main()
