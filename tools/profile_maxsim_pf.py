"""Phase-level profile of the search_many_maxsim_pf bench stage (r10
optimization round): reproduce bench.py's grouped-MaxSim setup exactly,
then attribute one call's wall time to its phases -- embed, candidate
generation (prefilter legs), rescore aggregate, fetch-back -- plus the
driver-side DataFrame construction cost (plan building + analysis),
which per-query serving pays on EVERY call.

Usage: python tools/profile_maxsim_pf.py [--repeats N]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from letsearch_spark.collection import Collection
    from letsearch_spark.queries import load
    from letsearch_spark.session import get_spark

    spark = get_spark(
        "profile-maxsim-pf", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    grp_root = tempfile.mkdtemp(prefix="ls_prof_grp_")
    gcoll = Collection.create(
        spark, grp_root, name="benchg", index_columns=["text"],
        model_name="stub://16",
    )
    gcoll.import_df(
        load(spark, SF_DIR, "documents").select(
            "text", (F.col("doc_id") % 625).cast("string").alias("grp")
        )
    )
    gcoll.embed_column("text")
    gcoll.serve_filter_columns = ["grp"]
    gcoll._maxsim_pool_view("text", "grp")  # build + cache the sidecar

    many_sets = [[f"spark join {i}", f"window batch {i}"] for i in range(10)]

    # warmup (mirrors the bench: the timed region is steady-state)
    gcoll.search_many_multi(
        "text", many_sets, limit=10, group_col="grp", prefilter_k=8
    ).count()

    # ---- phase attribution ------------------------------------------
    for rep in range(args.repeats):
        t0 = time.time()
        df = gcoll.search_many_multi(
            "text", many_sets, limit=10, group_col="grp", prefilter_k=8
        )
        t1 = time.time()
        df.count()
        t2 = time.time()
        print(
            f"rep {rep}: build(dataframe construction + embed) "
            f"{t1 - t0:.3f}s  execute(count) {t2 - t1:.3f}s  "
            f"total {t2 - t0:.3f}s"
        )

    # ---- candidate-generation-only timing ----------------------------
    serve, base, g = gcoll._maxsim_serve_base("text", 10, "grp", None)
    texts = [q for qs in many_sets for q in qs]
    vecs = [[float(x) for x in v] for v in gcoll._embedder().embed(texts)]
    for rep in range(2):
        t0 = time.time()
        cand_base = gcoll._maxsim_prefilter(
            "text", base, g, vecs, 8, "grp", None
        )
        t1 = time.time()
        n = cand_base.count()
        t2 = time.time()
        print(
            f"prefilter rep {rep}: build {t1 - t0:.3f}s  "
            f"execute {t2 - t1:.3f}s  rows {n}"
        )

    # ---- rescore-only timing (no prefilter: exact over 625 groups) ---
    for rep in range(2):
        t0 = time.time()
        df = gcoll.search_many_multi(
            "text", many_sets, limit=10, group_col="grp"
        )
        t1 = time.time()
        df.count()
        t2 = time.time()
        print(
            f"exact(no prefilter) rep {rep}: build {t1 - t0:.3f}s  "
            f"execute {t2 - t1:.3f}s"
        )

    # ---- cProfile of one full call (driver-side attribution) ---------
    pr = cProfile.Profile()
    pr.enable()
    gcoll.search_many_multi(
        "text", many_sets, limit=10, group_col="grp", prefilter_k=8
    ).count()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())

    spark.stop()


if __name__ == "__main__":
    main()
