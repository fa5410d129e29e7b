"""Broadcast Bloom-filter decontamination: the zero-corpus-shuffle path.

The join-based ``ngram_containment_pairs`` (operators/dedup.py:145)
shuffles the CORPUS side on shingle -- at 100 TB that is the dominant
cost even though the probe side (an eval/benchmark set) is tiny. This
module replaces the corpus shuffle with a broadcast Bloom filter built
over the probe shingles:

1. shingle the probes (small side), size a Bloom filter from the
   requested false-positive rate, and set its bits from k seeded
   ``xxhash64`` positions computed JVM-side;
2. broadcast the bitmap (1.2 bytes/element at 1% fpp -- a 2M-shingle
   benchmark suite is ~3 MiB) and stream the corpus shingles through a
   vectorized Arrow bit-test: scan + map, NO shuffle of corpus data;
3. run the exact containment join only on the surviving shingles.

Correctness does not depend on the Bloom's false-positive rate: a false
positive adds a corpus shingle that matches no probe shingle, and the
exact equi-join in step 3 drops it. There are no false negatives, so the
result is bit-identical to ``ngram_containment_pairs`` -- the DuckDB
oracle for the join path verifies this path too.

The hot-shingle skew cap stays exact as well: Bloom membership depends
only on the shingle value, so for any surviving shingle EVERY corpus
occurrence survives, and a document-frequency count over the survivors
equals the full-corpus count for that shingle.

No reference analog (SURVEY.md §2.7 north-star family); the design is
the standard broadcast-Bloom decontamination used by large-scale LM data
pipelines.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from letsearch_spark.operators.dedup import shingles

# collect() ceiling for probe-side bit positions; above this the probe
# set is no longer "the small side" and the join path is the right tool.
DEFAULT_MAX_PROBE_SHINGLES = 2_000_000

_MAX_BITS = 1 << 33  # 1 GiB bitmap ceiling -- loud refusal past this


def _bloom_geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """(num_bits, num_hashes) for a Bloom over ``n_items`` at ``fpp``."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(1024, m)
    if m > _MAX_BITS:
        raise ValueError(
            f"Bloom filter would need {m} bits (> {_MAX_BITS}); "
            "the probe set is too large for the broadcast path -- use "
            "operators.dedup.ngram_containment_pairs instead"
        )
    k = int(round(m / n * math.log(2)))
    return m, min(max(k, 1), 16)


def _position_cols(num_bits: int, num_hashes: int, col: str = "s"):
    """k seeded 64-bit hash positions, computed JVM-side. xxhash64 over
    (seed-literal, shingle) gives k independent hash families without a
    Python round-trip; pmod keeps the position non-negative."""
    return [
        F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(num_bits)).alias(
            f"_bp{i}"
        )
        for i in range(num_hashes)
    ]


def build_shingle_bloom(
    probes: DataFrame,
    probe_id: str,
    probe_text: str,
    n: int = 3,
    fpp: float = 0.01,
    max_probe_shingles: int = DEFAULT_MAX_PROBE_SHINGLES,
):
    """Build a broadcast Bloom filter over the probe set's word n-gram
    shingles.

    Returns ``(bloom_broadcast, num_bits, num_hashes, probe_shingles)``
    where ``bloom_broadcast`` is a ``sc.broadcast`` of a uint8 bitmap and
    ``probe_shingles`` is the (probe_id, s) frame (reused by the verify
    join so the shingling happens once).

    Raises ``ValueError`` when the probe set exceeds
    ``max_probe_shingles`` distinct shingles -- the broadcast path is for
    a small probe side; past the cap the join path is cheaper than the
    driver collect.
    """
    pb = shingles(probes, probe_id, probe_text, n).withColumnRenamed(
        "id", "probe_id"
    )
    pb = pb.persist()
    n_shingles = pb.select("s").distinct().count()
    if n_shingles > max_probe_shingles:
        pb.unpersist()
        raise ValueError(
            f"probe set has {n_shingles} distinct shingles "
            f"(> max_probe_shingles={max_probe_shingles}); use "
            "operators.dedup.ngram_containment_pairs for a large probe side"
        )
    num_bits, num_hashes = _bloom_geometry(n_shingles, fpp)
    bitmap = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
    if n_shingles:
        # Arrow collect of the single int64 position column: ~16 bytes/
        # position on the driver instead of ~150+ bytes/py4j Row, so the
        # 2M-shingle x k<=16 ceiling costs ~200 MB, not multiple GB.
        pos_pdf = (
            pb.select("s")
            .distinct()
            .select(
                F.explode(
                    F.array(*_position_cols(num_bits, num_hashes))
                ).alias("p")
            )
            .distinct()
            .toPandas()
        )
        pos = pos_pdf["p"].to_numpy(dtype=np.int64)
        np.bitwise_or.at(
            bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
        )
    sc = probes.sparkSession.sparkContext
    return sc.broadcast(bitmap), num_bits, num_hashes, pb


def bloom_hit_shingles(
    corpus: DataFrame,
    corpus_id: str,
    corpus_text: str,
    bloom_bcast,
    num_bits: int,
    num_hashes: int,
    n: int = 3,
) -> DataFrame:
    """(corpus_id, s) for corpus shingles whose k Bloom bits are all set.

    The corpus side is scan + map only: shingles are exploded WITHOUT the
    per-doc distinct (duplicates cannot create new hits), positions are
    computed JVM-side, and the bit test is one vectorized Arrow batch per
    partition. Only the surviving rows -- proportional to the probe
    overlap, not the corpus -- ever shuffle."""

    @F.pandas_udf(BooleanType())
    def _bits_set(*cols: pd.Series) -> pd.Series:
        bits = bloom_bcast.value
        hit = np.ones(len(cols[0]), dtype=bool)
        for c in cols:
            p = c.values
            hit &= (bits[p >> 3] >> (p & 7) & 1).astype(bool)
        return pd.Series(hit)

    from letsearch_spark.operators.dedup import words_of

    words = words_of(F.col(corpus_text))
    # md5_60 inside the transform mirrors dedup.shingles (r11): the
    # verify equi-join keys on the hashed shingle, so both sides must
    # hash identically
    mk = (
        f"transform(sequence(0, size(words)-{n}),"
        f" i -> CAST(conv(substring(md5("
        f"concat_ws(' ', slice(words, i + 1, {n}))"
        f"), 1, 15), 16, 10) AS BIGINT))"
    )
    exploded = (
        corpus.select(F.col(corpus_id).alias("corpus_id"), words.alias("words"))
        .where(F.size("words") >= n)
        .select("corpus_id", F.explode(F.expr(mk)).alias("s"))
    )
    pos = _position_cols(num_bits, num_hashes)
    return (
        exploded.withColumn("_hit", _bits_set(*pos))
        .where(F.col("_hit"))
        .select("corpus_id", "s")
        .distinct()
    )


def decontaminate_with_bloom(
    corpus: DataFrame,
    probes: DataFrame,
    corpus_id: str,
    corpus_text: str,
    probe_id: str,
    probe_text: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    fpp: float = 0.01,
    max_probe_shingles: int = DEFAULT_MAX_PROBE_SHINGLES,
) -> DataFrame:
    """Benchmark decontamination via a broadcast Bloom pre-filter;
    bit-identical output to ``ngram_containment_pairs`` (same
    (corpus_id, probe_id, containment) rows, containment rounded to 6,
    >= threshold) at a fraction of the corpus-side cost.

    ``max_shingle_freq`` mirrors the join path's corpus-side hot-shingle
    cap exactly: document frequency is counted over the Bloom survivors,
    which for any surviving shingle equals its full-corpus frequency
    (membership depends only on the shingle value, so all of its
    occurrences survive together)."""
    bloom, num_bits, num_hashes, pb = build_shingle_bloom(
        probes, probe_id, probe_text, n, fpp, max_probe_shingles
    )
    try:
        hits = bloom_hit_shingles(
            corpus, corpus_id, corpus_text, bloom, num_bits, num_hashes, n
        )
        if max_shingle_freq is not None:
            hot = (
                hits.groupBy("s")
                .agg(F.count(F.lit(1)).alias("df_"))
                .where(F.col("df_") > max_shingle_freq)
                .select("s")
            )
            hits = hits.join(F.broadcast(hot), "s", "left_anti")
        pcnt = pb.groupBy("probe_id").agg(F.count(F.lit(1)).alias("np"))
        inter = (
            hits.join(pb, "s")
            .groupBy("corpus_id", "probe_id")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        containment = F.round(F.col("i") * 1.0 / F.col("np"), 6)
        out = (
            inter.join(pcnt, "probe_id")
            .select(
                "corpus_id", "probe_id", containment.alias("containment")
            )
            .where(F.col("containment") >= threshold)
        )
        # materialize before releasing the probe-shingle cache and the
        # broadcast bitmap that the plan depends on
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        pb.unpersist()
