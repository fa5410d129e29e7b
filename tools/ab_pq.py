"""Quiet-host A/B for search_topk_pq (flagged drifting r4 9.8 / r5 8.1 /
r6 11.1 vs the 6.9 s gate row). Same collection build as bench.py, then
interleaved repeats of the exact path (search_topk) and the PQ path,
with an optional cProfile of one PQ repeat.

Usage: python tools/ab_pq.py [--profile] [--repeats N]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("BENCH_SEARCHES", "20"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from letsearch_spark.collection import Collection
    from letsearch_spark.session import get_spark

    spark = get_spark(
        "ab-pq", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ls_abpq_")
    coll = Collection.create(
        spark, root, name="ab", index_columns=["text"], model_name="stub://16"
    )
    coll.import_parquet(os.path.join(SF_DIR, "documents.parquet"))
    coll.embed_column("text")
    coll.search("text", "warmup", limit=10).collect()
    coll.search("text", "warmup", limit=10, strategy="pq").collect()

    def stage_exact():
        for i in range(N):
            coll.search(
                "text", f"spark join query window batch {i}", limit=10
            ).collect()

    def stage_pq():
        for i in range(N):
            coll.search(
                "text",
                f"spark join query window batch {i}",
                limit=10,
                strategy="pq",
            ).collect()

    results: dict[str, list[float]] = {"exact": [], "pq": []}
    for _ in range(args.repeats):
        for name, fn in (("exact", stage_exact), ("pq", stage_pq)):
            t0 = time.time()
            fn()
            results[name].append(round(time.time() - t0, 3))
    for name, times in results.items():
        print(f"{name}: runs={times} min={min(times)}")

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        stage_pq()
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(20)


if __name__ == "__main__":
    main()
