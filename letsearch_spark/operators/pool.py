"""Distributed elementwise vector pooling.

North-star operator (SURVEY.md §2.7, not in the reference): aggregate an
``array<float>`` column elementwise per group -- chunk embeddings pooled
to document embeddings, per-cluster centroids over the FULL corpus (the
driver-sampled trainer in operators/ann.py caps at ``sample_limit``
vectors; this has no cap), per-label prototypes for classification.

Two implementations, same contract:

* ``method='explode'`` (default, the 100 TB shape): posexplode ->
  partial-aggregated avg per (group, position) -> sorted re-assembly.
  Every stage is a real hash aggregate with map-side partials, so a
  mega-group (one cluster holding half the corpus) spreads across ALL
  tasks of the (group, pos) aggregation instead of single-tasking -- the
  dimension count multiplies the key space, which is exactly what kills
  the skew.
* ``method='pandas'``: groupBy().applyInPandas with one ``np.mean`` per
  group -- one shuffle instead of two and far fewer keys, the right
  trade when groups are many, small, and wide (768+ dims). Buffers each
  group's vectors in one task: bounded-group-size inputs only.

``exact_units`` switches the mean to fixed-point integer accumulation
(``sum(round(v * units)) / (units * n)``): integer sums are
order-independent, so results are bit-stable across partitionings,
retries, AND engines -- the same micro-cents trick queries.py uses for
money sums, here so the DuckDB oracle can hash-match the pooled floats
exactly. Costs a 1/units quantization of each input element.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from letsearch_spark.functions.vector import l2_normalize


def mean_pool_vectors(
    df: DataFrame,
    group_cols: list[str] | str,
    vec_col: str,
    out_col: str = "pooled",
    normalize: bool = False,
    method: str = "explode",
    exact_units: int | None = None,
) -> DataFrame:
    """Per-group elementwise mean of ``vec_col``: one row per group with
    ``out_col`` (array<double>) and ``n_vecs`` (group size). Vectors must
    share one dimensionality within a group; null vectors are dropped by
    the explode. ``normalize=True`` L2-normalizes the pooled vector
    (zero vector stays zero, matching cosine_similarity's convention).
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if method == "explode":
        out = _pool_explode(df, group_cols, vec_col, out_col, exact_units)
    elif method == "pandas":
        out = _pool_pandas(df, group_cols, vec_col, out_col, exact_units)
    else:
        raise ValueError(f"method must be explode|pandas, got {method!r}")
    if normalize:
        out = out.withColumn(out_col, l2_normalize(F.col(out_col)))
    return out


def _pool_explode(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    out_col: str,
    exact_units: int | None,
) -> DataFrame:
    ex = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("_pos", "_v")
    )
    if exact_units is not None:
        units = float(exact_units)
        q = F.round(F.col("_v").cast("double") * units).cast("long")
        per = ex.groupBy(*group_cols, "_pos").agg(
            F.sum(q).alias("_s"), F.count(q).alias("_n")
        )
        mean = F.col("_s") / (F.lit(units) * F.col("_n"))
    else:
        per = ex.groupBy(*group_cols, "_pos").agg(
            F.avg(F.col("_v").cast("double")).alias("_m"),
            F.count("_v").alias("_n"),
        )
        mean = F.col("_m")
    per = per.select(*group_cols, "_pos", mean.alias("_m"), "_n")
    return per.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
            lambda s: s.getField("_m"),
        ).alias(out_col),
        F.max("_n").alias("n_vecs"),
    )


def _maxsim_validate(df, k: int, best_key_col: str | None) -> None:
    if not 1 <= k <= 100:
        raise ValueError(f"k must be in [1, 100], got {k}")
    if best_key_col is not None and not isinstance(
        df.schema[best_key_col].dataType, T.NumericType
    ):
        # the tie-break negates the key; a string key would implicit-
        # cast to NULL and resolve ties nondeterministically
        raise ValueError(
            f"best_key_col {best_key_col!r} must be numeric, got "
            f"{df.schema[best_key_col].dataType.simpleString()}"
        )


def _cosine_cols(
    df: DataFrame,
    flat_qvecs: list[list[float]],
    keep_cols: list[str],
    vec_col: str,
    norm_col: str | None,
):
    """Shared cosine projection for the MaxSim paths: compute the row's
    L2 norm ONCE (or reuse a precomputed ``norm_col`` -- the serve
    view's ``_vnorm``) and score every query vector against it via
    :func:`cosine_with_norm` -- one aggregate fold per (row, qvec)
    instead of three, bit-identical scores (r10; the _serve_score
    precedent). Two stacked selects so the shared norm is a real
    column; CollapseProject keeps multiply-referenced non-cheap
    aliases, so the norm is not re-inlined per cosine."""
    from letsearch_spark.functions.vector import cosine_with_norm, l2_norm

    shared = (
        F.col(norm_col).alias("_an")
        if norm_col is not None
        else l2_norm(vec_col).alias("_an")
    )
    pre = df.where(F.col(vec_col).isNotNull()).select(
        *keep_cols, vec_col, shared
    )
    return pre.select(
        *keep_cols,
        *[
            cosine_with_norm(vec_col, "_an", q).alias(f"_c{j}")
            for j, q in enumerate(flat_qvecs)
        ],
    )


def _maxsim_stage1(
    df: DataFrame,
    qsets: list[list[list[float]]],
    group_col: str,
    vec_col: str,
    best_key_col: str | None,
    norm_col: str | None = None,
):
    """The ONE partial-aggregated MaxSim pass, shared by
    :func:`maxsim_topk` (N=1) and :func:`maxsim_topk_many` so the
    cosine/tie-break arithmetic cannot drift between them: per-chunk
    cosines for every query vector scan-side, per-group per-qvec maxes
    + chunk count + (per query) the best-chunk key via ``max_by`` on
    (fixed-order cosine sum, -key). Returns (agg, spans): agg columns
    are (group, _m<j>..., n_chunks[, _bk<i>...]), spans[i] the
    flattened qvec indices of query i."""
    flat = [(i, q) for i, qs in enumerate(qsets) for q in qs]
    n_q = len(qsets)
    extra_cols = (
        [best_key_col]
        if best_key_col is not None and best_key_col != group_col
        else []
    )
    rows = _cosine_cols(
        df,
        [q for _, q in flat],
        [group_col, *extra_cols],
        vec_col,
        norm_col,
    )
    # per-query flattened index ranges (contiguous by construction)
    spans: list[list[int]] = [[] for _ in range(n_q)]
    for j, (i, _) in enumerate(flat):
        spans[i].append(j)
    aggs = [F.max(f"_c{j}").alias(f"_m{j}") for j in range(len(flat))]
    aggs.append(F.count(F.lit(1)).alias("n_chunks"))
    if best_key_col is not None:
        # ONE projection for all per-query cosine sums (withColumn in a
        # loop stacks a Project node per query), via the same
        # _span_sum fold the score columns use -- one copy of the
        # fixed-order-sum arithmetic
        rows = rows.select(
            "*",
            *[
                _span_sum("_c", spans[i]).alias(f"_s{i}")
                for i in range(n_q)
            ],
        )
        for i in range(n_q):
            aggs.append(
                F.max_by(
                    F.col(best_key_col),
                    F.struct(F.col(f"_s{i}"), -F.col(best_key_col)),
                ).alias(f"_bk{i}")
            )
    return rows.groupBy(group_col).agg(*aggs), spans


def _span_sum(prefix: str, span: list[int]):
    s = F.col(f"{prefix}{span[0]}")
    for j in span[1:]:
        s = s + F.col(f"{prefix}{j}")
    return s


def _maxsim_scored(
    df: DataFrame,
    qsets: list[list[list[float]]],
    group_col: str,
    vec_col: str,
    best_key_col: str | None,
    unique_groups: bool,
    norm_col: str | None = None,
) -> DataFrame:
    """Build the per-group scored frame (group, n_chunks, _q<i>...,
    [_bk<i>...]) both public functions consume.

    Grouped path: :func:`_maxsim_stage1` (partial-aggregated per-qvec
    maxes) + the fixed-order span sums.

    ``unique_groups=True`` (the serving default's degenerate case,
    collection.py search_multi with group_col=None): every group is a
    single row, so the per-group MAX of each cosine is the cosine
    itself and the groupBy would shuffle the full corpus for nothing --
    map-side combine reduces singletons by zero. Instead the score is
    computed scan-side as the SAME fixed-order span sum over the raw
    cosines (m<j> == c<j> when the group is one row, so the float
    addition order -- and hence every bit of the result -- is identical
    to the grouped path), n_chunks is literally 1, and the best chunk
    of a one-chunk group is the row's own key. Zero aggregate
    exchanges: the plan stays a scan-side projection feeding the
    caller's TakeOrderedAndProject / per-partition prune.
    """
    n_q = len(qsets)
    if not unique_groups:
        agg, spans = _maxsim_stage1(
            df, qsets, group_col, vec_col, best_key_col, norm_col
        )
        return agg.select(
            group_col,
            "n_chunks",
            *[_span_sum("_m", spans[i]).alias(f"_q{i}") for i in range(n_q)],
            *([f"_bk{i}" for i in range(n_q)] if best_key_col else []),
        )
    flat = [(i, q) for i, qs in enumerate(qsets) for q in qs]
    spans = [[] for _ in range(n_q)]
    for j, (i, _) in enumerate(flat):
        spans[i].append(j)
    rows = _cosine_cols(
        df,
        [q for _, q in flat],
        [
            group_col,
            *(
                [best_key_col]
                if best_key_col is not None and best_key_col != group_col
                else []
            ),
        ],
        vec_col,
        norm_col,
    )
    return rows.select(
        group_col,
        F.lit(1).cast("long").alias("n_chunks"),
        *[_span_sum("_c", spans[i]).alias(f"_q{i}") for i in range(n_q)],
        *(
            [F.col(best_key_col).alias(f"_bk{i}") for i in range(n_q)]
            if best_key_col
            else []
        ),
    )


def maxsim_topk(
    df: DataFrame,
    query_vecs,
    k: int = 10,
    group_col: str = "doc_id",
    vec_col: str = "vector",
    score_col: str = "score",
    best_key_col: str | None = None,
    unique_groups: bool = False,
    norm_col: str | None = None,
) -> DataFrame:
    """Multi-vector late-interaction retrieval (the ColBERT MaxSim rule,
    Khattab & Zaharia 2020): score(doc) = sum over the query's vectors of
    the max cosine against any of the doc's chunk vectors, then top-k
    docs.

    Mean-pooling (``mean_pool_vectors``) collapses a document to one
    vector and loses which chunk matched; MaxSim keeps per-chunk
    granularity at query time without a per-chunk result join: each
    chunk row computes its |Q| cosines scan-side (Catalyst expressions,
    no UDF), ONE groupBy reduces them with per-query-vector MAX -- a
    partial-aggregated hash aggregate, so a mega-document spreads over
    its scan partitions map-side and only |docs| x |Q| maxes shuffle --
    and the final score is the fixed-order sum of the maxes (m0 + m1 +
    ... in query order, deterministic and engine-exact). Top-k is
    TakeOrderedAndProject over one row per doc. The aggregation itself
    is the shared :func:`_maxsim_stage1` (maxsim_topk is its N=1 case).

    ``query_vecs`` is a sequence of query vectors (1..~32 in practice --
    they become plan literals). Null chunk vectors are dropped. Returns
    (group, score, n_chunks) ordered by (score DESC, group ASC), k rows.

    ``best_key_col`` (r8, the Collection serving path): name of a
    NUMERIC per-chunk key column; when set, the result carries
    ``best_key`` = the key of the group's best-matching chunk (highest
    fixed-order cosine sum over the query vectors, ties to the lowest
    key) via ``max_by`` in the SAME aggregation -- the snippet a
    late-interaction serving layer fetches back, at zero extra shuffles.
    The group score arithmetic is unchanged.

    ``unique_groups=True`` (r9) declares that ``group_col`` values are
    unique per row (single-vector documents -- the Collection serving
    default with group_col=None): the groupBy is skipped entirely
    (see :func:`_maxsim_scored`) and the plan collapses to a scan-side
    projection + TakeOrderedAndProject, zero aggregate exchanges,
    bit-identical results. The caller owns the uniqueness contract --
    with duplicates present each row scores separately.

    Non-finite embedding values (NaN/inf) are unsupported: NaN orders
    differently in Spark's orderBy (greatest) vs the batched path's
    Arrow prune (last), so the batched/per-query parity guarantee
    holds for finite scores only; the batched prune asserts it.

    ``norm_col`` (r10): name of a column holding the PRECOMPUTED
    ``l2_norm(vec_col)`` (the Collection serve view's ``_vnorm``);
    when given, the per-row norm is read instead of recomputed, and
    each cosine is one aggregate fold instead of three -- scores stay
    bit-identical (see :func:`~letsearch_spark.functions.vector.cosine_with_norm`).
    """
    qvecs = [[float(x) for x in q] for q in query_vecs]
    if not qvecs:
        raise ValueError("query_vecs must be non-empty")
    _maxsim_validate(df, k, best_key_col)
    scored = _maxsim_scored(
        df, [qvecs], group_col, vec_col, best_key_col, unique_groups,
        norm_col,
    )
    sel_extra = (
        [F.col("_bk0").alias("best_key")] if best_key_col is not None else []
    )
    return (
        scored.select(
            group_col,
            F.col("_q0").alias(score_col),
            "n_chunks",
            *sel_extra,
        )
        .orderBy(F.desc(score_col), F.asc(group_col))
        .limit(k)
    )


def maxsim_topk_many(
    df: DataFrame,
    query_sets,
    k: int = 10,
    group_col: str = "doc_id",
    vec_col: str = "vector",
    score_col: str = "score",
    best_key_col: str | None = None,
    unique_groups: bool = False,
    norm_col: str | None = None,
) -> DataFrame:
    """Batched MaxSim: N multi-vector queries scored in ONE plan -- the
    bulk-eval form of :func:`maxsim_topk` (r8, completing the batched
    family next to hamming_knn_join / ivf_pq_knn_join / pq_knn_join).

    ``query_sets`` is a sequence of query-vector LISTS (one list per
    query). Stage 1 is the SHARED :func:`_maxsim_stage1` aggregation,
    computing EVERY query's per-group maxes (and per-query best chunks
    when ``best_key_col`` is set) in one pass -- only
    |groups| x sum(|Q_i|) maxes shuffle. Stage 2 prunes candidates per
    PARTITION per query (an Arrow pass: top-k by (score DESC, group
    ASC) inside each batch -- a superset of the global top-k), so the
    final per-query rank window sorts at most partitions x N x k rows,
    never |groups| x N -- the knn_join candidates-only shape.

    Returns (query_idx, group, score, n_chunks[, best_key], rank),
    rank <= k per query, bit-identical to running :func:`maxsim_topk`
    per query (same cosine expressions, same fixed-order sums, same
    tie-breaks -- guaranteed structurally by the shared stage 1).

    ``unique_groups=True`` (r9): see :func:`maxsim_topk` -- skips the
    stage-1 groupBy when each row is its own group, so the only
    exchange left is the final rank window over the already-pruned
    <= partitions x N x k candidates. Scores must be finite (the
    prune raises on NaN/inf -- NaN orders differently in pandas vs
    Spark and would silently break the parity contract).
    """
    from pyspark.sql.window import Window

    qsets = [[[float(x) for x in q] for q in qs] for qs in query_sets]
    if not qsets or any(not qs for qs in qsets):
        raise ValueError("query_sets must be non-empty lists of vectors")
    n_vecs = sum(len(qs) for qs in qsets)
    if n_vecs > 256:
        raise ValueError(
            f"{n_vecs} query vectors in one batch -- each becomes a "
            "plan literal; chunk the batch (<= 256 vectors per call)"
        )
    _maxsim_validate(df, k, best_key_col)
    n_q = len(qsets)
    scored = _maxsim_scored(
        df, qsets, group_col, vec_col, best_key_col, unique_groups,
        norm_col,
    )

    gtype = df.schema[group_col].dataType.simpleString()
    fields = f"query_idx long, group {gtype}, {score_col} double, n_chunks long"
    if best_key_col is not None:
        ktype = df.schema[best_key_col].dataType.simpleString()
        fields += f", best_key {ktype}"
    with_best = best_key_col is not None

    def prune(batches):
        for pdf in batches:
            outs = []
            for i in range(n_q):
                cols = {
                    "group": pdf[group_col],
                    score_col: pdf[f"_q{i}"],
                    "n_chunks": pdf["n_chunks"],
                }
                if with_best:
                    cols["best_key"] = pdf[f"_bk{i}"]
                sub = pd.DataFrame(cols)
                if not np.isfinite(sub[score_col].to_numpy(dtype="float64")).all():
                    # NaN sorts last in pandas but greatest in Spark's
                    # orderBy -- a non-finite score would break the
                    # batched==per-query parity contract silently
                    raise ValueError(
                        "maxsim_topk_many: non-finite score (NaN/inf "
                        "embedding values are unsupported)"
                    )
                sub = sub.sort_values(
                    [score_col, "group"], ascending=[False, True]
                ).head(k)
                sub.insert(0, "query_idx", i)
                outs.append(sub)
            yield pd.concat(outs, ignore_index=True)

    cand = scored.mapInPandas(prune, fields)
    w = Window.partitionBy("query_idx").orderBy(
        F.desc(score_col), F.asc("group")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_idx", "rank")
    )


def _pool_pandas(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    out_col: str,
    exact_units: int | None,
) -> DataFrame:
    group_fields = [df.schema[c] for c in group_cols]
    schema = T.StructType(
        [
            *group_fields,
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
            T.StructField("n_vecs", T.LongType()),
        ]
    )
    units = None if exact_units is None else float(exact_units)

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = pdf[vec_col].dropna()
        if not len(vecs):
            # all-null group: emit nothing, matching method='explode'
            # (which drops such groups at the explode); without this
            # guard mean(axis=0) of an empty array returns a scalar NaN
            # (schema mismatch) and exact_units divides by zero
            empty = {c: pd.Series([], dtype=pdf[c].dtype) for c in group_cols}
            empty[out_col] = pd.Series([], dtype=object)
            empty["n_vecs"] = pd.Series([], dtype="int64")
            return pd.DataFrame(empty)
        x = np.array(vecs.tolist(), dtype=np.float64)
        if units is not None:
            # mirror the fixed-point path: away-from-zero half rounding
            # (np.round is half-even, so round via floor(|x|+0.5)).
            # Guard BEFORE the int64 cast (r9 review catch): casting a
            # NaN would wrap to INT64_MIN and poison the mean with a
            # silently-finite garbage value instead of a visible NaN
            if not np.isfinite(x).all():
                raise ValueError(
                    "mean_pool_vectors exact_units: non-finite vector "
                    "element (NaN/inf inputs are unsupported in the "
                    "fixed-point path)"
                )
            q = (
                np.sign(x * units) * np.floor(np.abs(x * units) + 0.5)
            ).astype(np.int64)
            m = q.sum(axis=0) / (units * len(x))
        else:
            m = x.mean(axis=0)
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row[out_col] = [m.tolist()]
        row["n_vecs"] = [len(x)]
        return pd.DataFrame(row)

    return df.groupBy(*group_cols).applyInPandas(pool, schema)
