"""Tests for skew helpers (result equivalence) and quantized vectors
(round-trip error bounds, top-k agreement)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark, sf_dir):
    import os

    from letsearch_spark.operators.skew import salted_join

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_stage_agg_equals_direct(spark, sf_dir):
    import os

    from letsearch_spark.operators.skew import two_stage_agg

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    direct = {
        (r["l_returnflag"],): (r["s"], r["m"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("s"),
            F.max("l_orderkey").alias("m"),
        )
        .collect()
    }
    staged = {
        (r["l_returnflag"],): (r["sum_q"], r["max_l_orderkey"])
        for r in two_stage_agg(
            li.withColumn("q", F.col("l_quantity").cast("long")),
            ["l_returnflag"],
            {"q": "sum", "l_orderkey": "max"},
        )
        .withColumnRenamed("sum_q", "sum_q")
        .collect()
    }
    assert direct == staged


def test_two_stage_agg_rejects_nonalgebraic():
    from letsearch_spark.operators.skew import two_stage_agg

    with pytest.raises(ValueError):
        two_stage_agg(None, ["k"], {"v": "avg"})


@pytest.mark.parametrize("variant,tol", [("f16", 2e-3), ("i8", 2e-2)])
def test_quantize_roundtrip(spark, sf_dir, variant, tol):
    import os

    from letsearch_spark.functions.quantize import dequantize_column, quantize_column

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(50)
    packed = quantize_column(emb, "embedding", variant, out_col="qv")
    restored = dequantize_column(packed, "qv", variant, out_col="rv")
    rows = restored.select("embedding", "rv").collect()
    for r in rows:
        a = np.array(r["embedding"], dtype=np.float64)
        b = np.array(r["rv"], dtype=np.float64)
        denom = max(np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() / denom < tol


def test_quantized_topk_agrees_with_f32(spark, sf_dir):
    import os

    from letsearch_spark.functions.quantize import dequantize_column, quantize_column
    from letsearch_spark.operators.topk import cosine_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        F.col("vec_id").alias("_key"), F.col("embedding").alias("vector")
    )
    q = emb.where(F.col("_key") == 5).first()["vector"]
    exact = [r["_key"] for r in cosine_topk(emb, q, k=5).collect()]

    f16 = dequantize_column(
        quantize_column(emb, "vector", "f16"), "vector", "f16"
    )
    approx = [r["_key"] for r in cosine_topk(f16, q, k=5).collect()]
    # f16 error ~1e-3: the self-hit and most of the top-5 must survive
    assert approx[0] == 5
    assert len(set(exact) & set(approx)) >= 4


def test_f32_passthrough_and_unknown_variant(spark, sf_dir):
    import os

    from letsearch_spark.functions.quantize import quantize_column

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    assert quantize_column(emb, "embedding", "f32") is emb
    with pytest.raises(ValueError):
        quantize_column(emb, "embedding", "i4")
