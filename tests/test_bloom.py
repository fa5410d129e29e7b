"""Broadcast-Bloom decontamination (operators/bloom.py): the result
must be bit-identical to the join path for ANY false-positive rate, and
the probe-size guard must refuse loudly."""

import pytest
from pyspark.sql import functions as F


def _split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


@pytest.mark.parametrize("fpp,cap", [(0.01, 100), (0.9, 100), (0.01, None)])
@pytest.mark.deep  # auditor tier (pytest.ini): bloom-vs-join equivalence sweep; decontaminate_bloom is oracle-hash-checked each round
def test_bloom_equals_join_path(spark, sf_dir, fpp, cap):
    """fpp=0.9 forces a tiny, collision-heavy bitmap -- the exact verify
    join must still strip every false positive; cap=None checks the
    uncapped semantics too."""
    from letsearch_spark.operators.bloom import decontaminate_with_bloom
    from letsearch_spark.operators.dedup import ngram_containment_pairs

    corpus, probes = _split(spark, sf_dir)
    kw = dict(n=3, threshold=0.5, max_shingle_freq=cap)
    exact = (
        ngram_containment_pairs(
            corpus, probes, "doc_id", "text", "doc_id", "text", **kw
        )
        .orderBy("corpus_id", "probe_id")
        .collect()
    )
    bloom = (
        decontaminate_with_bloom(
            corpus, probes, "doc_id", "text", "doc_id", "text", fpp=fpp, **kw
        )
        .orderBy("corpus_id", "probe_id")
        .collect()
    )
    assert len(exact) > 0  # the planted contamination must be visible
    assert bloom == exact


def test_bloom_prefilter_has_no_false_negatives(spark, sf_dir):
    """Every corpus shingle that appears in any probe must survive the
    bit-test (Bloom filters cannot produce false negatives)."""
    from letsearch_spark.operators.bloom import (
        bloom_hit_shingles,
        build_shingle_bloom,
    )
    from letsearch_spark.operators.dedup import shingles

    corpus, probes = _split(spark, sf_dir)
    bloom, m, k, pb = build_shingle_bloom(probes, "doc_id", "text", n=3)
    try:
        hits = bloom_hit_shingles(
            corpus, "doc_id", "text", bloom, m, k, n=3
        )
        true_overlap = (
            shingles(corpus, "doc_id", "text", 3)
            .withColumnRenamed("id", "corpus_id")
            .join(pb.select("s").distinct(), "s")
            .select("corpus_id", "s")
        )
        missed = true_overlap.join(
            hits, ["corpus_id", "s"], "left_anti"
        ).count()
        assert missed == 0
    finally:
        pb.unpersist()


def test_bloom_probe_size_guard(spark, sf_dir):
    from letsearch_spark.operators.bloom import decontaminate_with_bloom

    corpus, probes = _split(spark, sf_dir)
    with pytest.raises(ValueError, match="max_probe_shingles"):
        decontaminate_with_bloom(
            corpus,
            probes,
            "doc_id",
            "text",
            "doc_id",
            "text",
            max_probe_shingles=10,
        )


def test_bloom_empty_probes(spark, sf_dir):
    from letsearch_spark.operators.bloom import decontaminate_with_bloom

    corpus, probes = _split(spark, sf_dir)
    out = decontaminate_with_bloom(
        corpus,
        probes.where(F.lit(False)),
        "doc_id",
        "text",
        "doc_id",
        "text",
    )
    assert out.columns == ["corpus_id", "probe_id", "containment"]
    assert out.count() == 0


def test_bloom_build_at_scale_arrow_collect(spark):
    """The bitmap build collects bit positions through Arrow, not py4j
    Rows (ADVICE r5): exercise it at a few hundred thousand distinct
    shingles and verify every probe shingle's k bits are set (no false
    negatives by construction)."""
    import numpy as np
    from pyspark.sql import functions as F

    from letsearch_spark.operators.bloom import (
        _position_cols,
        build_shingle_bloom,
    )

    # 3000 probe docs x 35 unique words -> ~99k distinct 3-gram shingles
    probes = (
        spark.range(3000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}_"), F.col("id"))
                    for j in range(35)
                ],
            ).alias("text"),
        )
    )
    bloom, num_bits, num_hashes, pb = build_shingle_bloom(
        probes, "doc_id", "text", n=3, fpp=0.01
    )
    try:
        n_shingles = pb.select("s").distinct().count()
        assert n_shingles == 3000 * 33
        bits = bloom.value
        # every probe shingle must test positive against the bitmap
        pos = (
            pb.select("s")
            .distinct()
            .select(
                F.explode(
                    F.array(*_position_cols(num_bits, num_hashes))
                ).alias("p")
            )
            .toPandas()["p"]
            .to_numpy(dtype=np.int64)
        )
        assert bool(np.all(bits[pos >> 3] >> (pos & 7) & 1))
    finally:
        pb.unpersist()
        bloom.unpersist()
