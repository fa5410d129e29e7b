"""Quiet-host A/B for search_topk_local_hybrid (VERDICT r5 ask #2).

Builds the same sf0.1 bench collection, then interleaves repeats of the
local (dense-only) and local_hybrid stages and reports per-repeat and
min times, plus an optional cProfile of one hybrid repeat to attribute
the cost inside the pure-Python serving path (no Spark jobs after the
bundles are cached).

Usage: python tools/ab_local_hybrid.py [--profile] [--repeats N]
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
N_SEARCHES = int(os.environ.get("BENCH_SEARCHES", "20"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from letsearch_spark.collection import Collection
    from letsearch_spark.session import get_spark

    spark = get_spark(
        "ab-local-hybrid",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ls_ab_")
    coll = Collection.create(
        spark, root, name="ab", index_columns=["text"], model_name="stub://16"
    )
    coll.import_parquet(os.path.join(SF_DIR, "documents.parquet"))
    coll.embed_column("text")
    coll.search_rows("text", "warmup", limit=10, strategy="local_hybrid")
    coll.search_rows("text", "warmup", limit=10)

    def stage_local():
        for i in range(50 * N_SEARCHES):
            coll.search_rows("text", f"local {i}", limit=10)

    def stage_local_hybrid():
        for i in range(10 * N_SEARCHES):
            coll.search_rows(
                "text",
                f"spark join query window batch {i}",
                limit=10,
                strategy="local_hybrid",
            )

    results: dict[str, list[float]] = {"local": [], "local_hybrid": []}
    for rep in range(args.repeats):
        for name, fn in (("local", stage_local), ("local_hybrid", stage_local_hybrid)):
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
        stage_local_hybrid()
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
