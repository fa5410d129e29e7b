"""Exact and approximate top-k cosine search (K1 in SURVEY.md §2.3).

The reference answers top-k with a usearch HNSW graph
(vector_index.rs:128-152). Spark-first, the *exact* path is simply

    SELECT key, cosine(vec, q) AS score ORDER BY score DESC, key LIMIT k

which Catalyst executes as ``TakeOrderedAndProject``: each partition
computes its local top-k (map-side), and only k rows per partition travel
to the driver -- no global sort, no full shuffle. At 100 TB this is a
single scan with a few KB of network traffic; it parallelizes perfectly
and is the oracle against which approximate methods are judged.

Tie-breaking is ``key ASC`` (declared semantics -- the reference's usearch
tie order is unspecified; FIXTURES.md §2).

The approximate path buckets vectors with random hyperplane LSH (signed
projections), probing only the query's bucket (optionally multi-probe) --
the scan then touches ~1/2**bits of the data. This is the scale path for
repeated queries over a static corpus; build once, reuse.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from letsearch_spark.functions.vector import cosine_similarity


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    key_col: str = "_key",
    vec_col: str = "vector",
    score_col: str = "score",
) -> DataFrame:
    """Exact brute-force cosine top-k; score = 1 - cosine_distance
    (reference convention, vector_index.rs:141-149).

    limit bounds follow the reference API: 1 <= k <= 100 (serve.rs:155-161).
    """
    if not 1 <= k <= 100:
        raise ValueError(f"k must be in [1, 100], got {k}")
    q = [float(x) for x in query_vec]
    sim = cosine_similarity(vec_col, q)
    return (
        embeddings.select(F.col(key_col), sim.alias(score_col))
        .orderBy(F.desc(score_col), F.asc(key_col))
        .limit(k)
    )


def knn_join(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key_col: str = "_key",
    vec_col: str = "vector",
    query_key_col: str = "query_id",
    query_vec_col: str = "qvec",
    method: str = "numpy",
    exclude_self: bool = False,
) -> DataFrame:
    """Batched k-NN join: top-k neighbors in ``base`` for every query row.

    method='numpy' (default -- the 100-TB shape): queries are collected
    (they must be the small side), normalized into one matrix, and each
    base partition scores itself with a single float64 matmul +
    argpartition, emitting only its LOCAL top-k per query (<= k rows per
    partition per query, plus boundary ties). A final window reduces the
    (partitions x k) candidates per query. The all-pairs score matrix
    never materializes and nothing but candidates crosses the network --
    the batched analog of TakeOrderedAndProject.

    method='expr' -- the Catalyst-only correctness twin: broadcast the
    queries, score each (row, query) pair with the dot-product
    expression, then reduce in two stages: a LOCAL window keyed by
    (query, scan partition id) bounds every reducer at one scan
    partition's pairs, and the global window then ranks only the
    (partitions x k) surviving candidates. Scores differ from the numpy
    path only in float summation order (sequential vs pairwise).

    ``exclude_self`` drops pairs where the base key equals the query id
    (self-matches when the queries are drawn from the base table).
    """
    from letsearch_spark.functions.vector import dot_product, l2_norm

    if method == "expr":
        q = queries.select(
            F.col(query_key_col),
            F.col(query_vec_col).alias("__qv"),
            l2_norm(F.col(query_vec_col)).alias("__qn"),
        )
        b = base.select(
            F.col(key_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__n")
        )
        sim = dot_product(F.col(vec_col), F.col("__qv")) / (
            F.col("__n") * F.col("__qn")
        )
        pairs = b.crossJoin(F.broadcast(q))
        if exclude_self:
            pairs = pairs.where(F.col(key_col) != F.col(query_key_col))
        # stage 1: local top-k per (query, scan partition). The broadcast
        # join is map-side, so spark_partition_id() here IS the scan
        # partition; the window's exchange spreads the pairs over
        # |queries| x |partitions| reducers instead of collapsing the
        # whole dataset into |queries|.
        scored = pairs.select(
            query_key_col,
            key_col,
            sim.alias("score"),
            F.spark_partition_id().alias("__pid"),
        )
        wl = Window.partitionBy(query_key_col, "__pid").orderBy(
            F.desc("score"), F.asc(key_col)
        )
        candidates = (
            scored.withColumn("__lrank", F.row_number().over(wl))
            .where(F.col("__lrank") <= k)
            .drop("__pid", "__lrank")
        )
        # stage 2: global rank over candidates only (<= k per partition
        # per query survive stage 1)
        w = Window.partitionBy(query_key_col).orderBy(F.desc("score"), F.asc(key_col))
        return candidates.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).where(F.col("rank") <= k)

    if method != "numpy":
        raise ValueError(f"unknown method {method!r}; expected expr|numpy")

    import pandas as pd

    qrows = queries.select(query_key_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = (Q / qn).T  # dim x n_queries

    schema = f"{query_key_col} long, {key_col} long, score double"
    kk = k
    excl = exclude_self

    def score_partition(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            keys = pdf[key_col].values
            n = np.linalg.norm(X, axis=1, keepdims=True)
            n[n == 0] = 1.0
            S = (X / n) @ Qn  # rows x queries
            if excl:
                S[keys[:, None] == qids[None, :]] = -np.inf
            top = min(kk, S.shape[0])
            part = np.argpartition(-S, top - 1, axis=0)[:top]  # top x queries
            out_q, out_k, out_s = [], [], []
            for j in range(S.shape[1]):
                # keep EVERY candidate >= the kth score so boundary ties
                # are resolved by the final (score desc, key asc) window,
                # not by argpartition's arbitrary pick
                thresh = S[part[:, j], j].min()
                if not np.isfinite(thresh):
                    thresh = -np.inf  # all-excluded partition: emit nothing
                    rows = np.nonzero(S[:, j] > thresh)[0]
                else:
                    rows = np.nonzero(S[:, j] >= thresh)[0]
                out_q.extend([qids[j]] * len(rows))
                out_k.extend(keys[rows])
                out_s.extend(S[rows, j])
            yield pd.DataFrame(
                {query_key_col: out_q, key_col: out_k, "score": out_s}
            )

    local = base.select(key_col, vec_col).mapInPandas(score_partition, schema=schema)
    w = Window.partitionBy(query_key_col).orderBy(F.desc("score"), F.asc(key_col))
    return local.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )


# ---------------- approximate path: sign-LSH bucketing ----------------


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype(np.float64)


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Column: sign-LSH bucket id of an array<float> column.

    Pure Catalyst expression (aggregate over zip_with per plane) -- the
    signature is computed JVM-side during the scan; at 100 TB the planes
    (bits x dim doubles) are tiny literals baked into the plan.
    """
    bits = []
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.transform(vec_col, lambda x: x.cast("double")),
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def build_lsh_index(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "vector",
    bucket_col: str = "_bucket",
) -> DataFrame:
    """Materialize an LSH-bucketed copy of the embeddings table.

    Callers persist this partitioned by ``_bucket`` (parquet partition
    pruning then makes each probe read only the probed buckets).
    """
    planes = _hyperplanes(dim, bits, seed)
    return embeddings.withColumn(bucket_col, lsh_signature_col(F.col(vec_col), planes))


def multiprobe_signatures(sig: int, bits: int, radius: int) -> set[int]:
    """All bucket signatures within Hamming distance <= radius of ``sig``
    (sum of C(bits, d) for d <= radius buckets -- keep radius small)."""
    from itertools import combinations

    probes = {sig}
    for d in range(1, min(radius, bits) + 1):
        for combo in combinations(range(bits), d):
            flipped = sig
            for i in combo:
                flipped ^= 1 << i
            probes.add(flipped)
    return probes


def lsh_topk(
    indexed: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    key_col: str = "_key",
    vec_col: str = "vector",
    bucket_col: str = "_bucket",
    score_col: str = "score",
) -> DataFrame:
    """Approximate top-k: probe every bucket within Hamming distance
    ``multiprobe`` of the query's signature, brute-force only inside the
    probed buckets.

    With parquet partitioned by bucket this prunes the scan to
    ~(sum_{d<=multiprobe} C(bits,d)) / 2**bits of the data.
    """
    q = np.asarray(list(query_vec), dtype=np.float64)
    planes = _hyperplanes(len(q), bits, seed)
    sig = 0
    for i, plane in enumerate(planes):
        if float(plane @ q) >= 0:
            sig |= 1 << i
    probes = multiprobe_signatures(sig, bits, multiprobe)
    pruned = indexed.filter(F.col(bucket_col).isin(*[int(p) for p in probes]))
    return cosine_topk(
        pruned, q, k=k, key_col=key_col, vec_col=vec_col, score_col=score_col
    )
