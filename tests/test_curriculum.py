"""Curriculum ordering (operators/curriculum.py): the distributed rank
must equal a single-partition global window exactly, in both directions,
and the shard arithmetic must match SQL NTILE."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("wc"),
    ).persist()


def test_distributed_rank_matches_global_window(spark, scored):
    from letsearch_spark.operators.curriculum import distributed_rank

    got = {
        r["doc_id"]: r["rank"]
        for r in distributed_rank(
            scored, ["wc", "doc_id"], num_partitions=7
        ).collect()
    }
    want = {
        r["doc_id"]: r["rank"]
        for r in scored.withColumn(
            "rank", F.row_number().over(Window.orderBy("wc", "doc_id"))
        ).collect()
    }
    assert got == want


def test_distributed_rank_descending(spark, scored):
    from letsearch_spark.operators.curriculum import distributed_rank

    got = {
        r["doc_id"]: r["rank"]
        for r in distributed_rank(
            scored, ["wc", "doc_id"], ascending=False, num_partitions=5
        ).collect()
    }
    want = {
        r["doc_id"]: r["rank"]
        for r in scored.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("wc").desc(), F.col("doc_id").desc())
            ),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("k", [1, 3, 8])
def test_curriculum_shards_match_sql_ntile(spark, scored, k):
    from letsearch_spark.operators.curriculum import curriculum_shards

    got = {
        r["doc_id"]: r["shard"]
        for r in curriculum_shards(scored, "wc", "doc_id", k).collect()
    }
    want = {
        r["doc_id"]: r["shard"]
        for r in scored.withColumn(
            "shard", F.ntile(k).over(Window.orderBy("wc", "doc_id"))
        ).collect()
    }
    assert got == want


def test_curriculum_more_partitions_than_rows(spark, scored):
    """Empty range partitions must not perturb offsets."""
    from letsearch_spark.operators.curriculum import curriculum_shards

    tiny = scored.orderBy("doc_id").limit(3)
    rows = sorted(
        (r["rank"], r["shard"])
        for r in curriculum_shards(
            tiny, "wc", "doc_id", 8, num_partitions=16
        ).collect()
    )
    assert rows == [(1, 1), (2, 2), (3, 3)]


def test_curriculum_rejects_bad_args(spark, scored):
    from letsearch_spark.operators.curriculum import (
        curriculum_shards,
        distributed_rank,
    )

    with pytest.raises(ValueError, match="order_cols"):
        distributed_rank(scored, [])
    with pytest.raises(ValueError, match="num_shards"):
        curriculum_shards(scored, "wc", "doc_id", 0)


def test_reliable_checkpoint_pin(spark, scored, tmp_path):
    """pin='reliable' (VERDICT r5 ask #5): identical ranks to the
    localCheckpoint default, but persisted to the reliable checkpoint
    dir so an executor loss cannot orphan the result at 100 TB; without
    a configured checkpoint dir the option refuses loudly."""
    from letsearch_spark.operators.curriculum import distributed_rank

    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint directory"):
            distributed_rank(scored, ["wc", "doc_id"], pin="reliable")
    sc.setCheckpointDir(str(tmp_path / "ckpt"))

    local = distributed_rank(scored, ["wc", "doc_id"], pin="local")
    reliable = distributed_rank(scored, ["wc", "doc_id"], pin="reliable")
    a = sorted((r["doc_id"], r["rank"]) for r in local.collect())
    b = sorted((r["doc_id"], r["rank"]) for r in reliable.collect())
    assert a == b

    with pytest.raises(ValueError, match="pin"):
        distributed_rank(scored, ["wc"], pin="nope")


def test_shuffle_order_is_seeded_permutation(spark, scored):
    """shuffle_order: ranks form an exact 1..n permutation, reproduce
    for a fixed seed, differ across seeds, and match a single-process
    md5 twin (the same cross-engine hash family hash_split uses)."""
    import hashlib

    from letsearch_spark.operators.curriculum import shuffle_order

    ids = scored.select("doc_id")
    a = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_order(ids, "doc_id", seed=7).collect()
    }
    n = len(a)
    assert sorted(a.values()) == list(range(1, n + 1))

    again = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_order(ids, "doc_id", seed=7).collect()
    }
    assert again == a
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_order(ids, "doc_id", seed=8).collect()
    }
    assert other != a

    want = {
        k: rank
        for rank, k in enumerate(
            sorted(a, key=lambda k: (hashlib.md5(f"{k}#7".encode()).hexdigest(), k)),
            start=1,
        )
    }
    assert a == want
    # the epoch story: seed=epoch gives decorrelated orders over the
    # same materialized corpus
    assert "__sk" not in shuffle_order(ids, "doc_id").columns


def test_interleave_order_round_robin(spark):
    """interleave_order (r7): sources alternate while they last, within-
    source order is preserved, the result is an exact 1..n permutation,
    and the shape matches the SQL twin (row_number per source, then
    rank over (round, source))."""
    from pyspark.sql import Window

    from letsearch_spark.operators.curriculum import interleave_order

    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(3)] + [
        ("c", i) for i in range(1)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long").repartition(4)
    out = interleave_order(df, "src", ["doc_id"])
    got = sorted(
        (r["interleave_rank"], r["src"], r["doc_id"]) for r in out.collect()
    )
    # 1..n permutation
    assert [g[0] for g in got] == list(range(1, 10))
    # round 1: a0 b0 c0; round 2: a1 b1; ...; tail: a3 a4
    assert [(g[1], g[2]) for g in got] == [
        ("a", 0), ("b", 0), ("c", 0),
        ("a", 1), ("b", 1),
        ("a", 2), ("b", 2),
        ("a", 3), ("a", 4),
    ]
    # SQL window twin over any partitioning
    twin = (
        df.withColumn(
            "rnd", F.row_number().over(Window.partitionBy("src").orderBy("doc_id"))
        )
        .withColumn(
            "rk", F.row_number().over(Window.orderBy("rnd", "src"))
        )
    )
    t = sorted((r["rk"], r["src"], r["doc_id"]) for r in twin.collect())
    assert [(g[1], g[2]) for g in got] == [(x[1], x[2]) for x in t]

    with pytest.raises(ValueError):
        interleave_order(df, "src", [])


def test_interleave_order_skewed_sources(spark):
    """The r8 rewrite (rank-minus-offset instead of a per-source window,
    VERDICT r7 #4) under the shape that killed the old plan: two sources
    with 200:5 skew. Layout: 5 alternating pairs, then the big source's
    tail in order."""
    from letsearch_spark.operators.curriculum import interleave_order

    rows = [("big", i) for i in range(200)] + [("tiny", i) for i in range(5)]
    df = spark.createDataFrame(rows, "src string, doc_id long").repartition(8)
    got = sorted(
        (r["interleave_rank"], r["src"], r["doc_id"])
        for r in interleave_order(df, "src", ["doc_id"]).collect()
    )
    assert [g[0] for g in got] == list(range(1, 206))
    head = [(g[1], g[2]) for g in got[:10]]
    assert head == [
        ("big", 0), ("tiny", 0), ("big", 1), ("tiny", 1), ("big", 2),
        ("tiny", 2), ("big", 3), ("tiny", 3), ("big", 4), ("tiny", 4),
    ]
    assert [(g[1], g[2]) for g in got[10:]] == [
        ("big", i) for i in range(5, 200)
    ]


def test_interleave_order_null_source_group(spark):
    """A NULL source is a legitimate group (dirty provenance columns
    happen): the r8 offsets join must be null-safe, not silently drop
    those rows. NULL sorts FIRST (Spark asc), so within each round the
    null-source row comes before 'a'."""
    from letsearch_spark.operators.curriculum import interleave_order

    rows = [("a", 0), ("a", 1), (None, 10), (None, 11), ("b", 20)]
    df = spark.createDataFrame(rows, "src string, doc_id long")
    got = sorted(
        (r["interleave_rank"], r["src"], r["doc_id"])
        for r in interleave_order(df, "src", ["doc_id"]).collect()
    )
    assert [g[0] for g in got] == [1, 2, 3, 4, 5]
    assert [(g[1], g[2]) for g in got] == [
        (None, 10), ("a", 0), ("b", 20),
        (None, 11), ("a", 1),
    ]


def test_interleave_rounds_plan_no_per_source_window(spark):
    """Plan gate for the r8 rewrite: the round computation must be a
    broadcast join against the |sources|-row offset table — NO
    row_number window partitioned by the source column (the old shape
    serialized each source into one task). distributed_rank's internal
    windows sit behind its eager checkpoint, so the rounds plan showing
    any row_number at all would mean the fat window came back."""
    from letsearch_spark.operators.curriculum import _interleave_rounds

    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(7)]
    df = spark.createDataFrame(rows, "src string, doc_id long")
    rounds = _interleave_rounds(df, "src", ["doc_id"])
    plan = rounds._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
