"""Deterministic hash-based sampling and train/val/test splitting.

North-star training-data-pipeline operators (not in the reference,
SURVEY.md §2.7). The scale-correct way to sample 100 TB is NOT
``df.sample()`` -- RNG sampling changes with partitioning, retries, and
engine version, so reruns and downstream joins disagree. Hashing a stable
key gives a sample/split that is:

* reproducible across engines (the md5 formula is replicated in the
  DuckDB oracle and hash-matches exactly),
* stable under repartitioning, task retries, and appends (a doc keeps
  its split forever -- no train/test leakage when the corpus grows),
* group-aware for free (hash the *group* key, e.g. source domain or url
  host, to keep whole groups on one side of the split).

Both are pure map-side column expressions: zero shuffles, fully
codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from letsearch_spark.operators.dedup import md5_60

_BUCKETS = 1_000_000


def hash_bucket(key: Column, seed: int = 42, buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from a key column + seed."""
    return md5_60(F.concat(key.cast("string"), F.lit(f"#{seed}"))) % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash (see module doc)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * _BUCKETS))
    return df.where(hash_bucket(F.col(key_col), seed) < cut)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]``
    of each stratum's rows, chosen by key hash. The training-data use
    case is rebalancing a corpus by language/domain (downsample the head
    stratum, keep the tail) without RNG instability; all of hash
    sampling's properties (rerun/repartition/append stability) hold per
    stratum. Strata absent from ``fractions`` use ``default_fraction``.

    Pure map-side expression: the per-stratum cut is a CASE over
    ``strata_col`` compared against one hash -- zero shuffles."""
    return df.where(
        stratified_keep_col(
            key_col, strata_col, fractions, default_fraction, seed
        )
    )


def stratified_keep_col(
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> Column:
    """The boolean keep predicate behind :func:`stratified_hash_sample`,
    exposed as a Column so callers can carry it as a flag (audit/label
    use) instead of filtering."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    bucket = hash_bucket(F.col(key_col), seed)
    cut = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        val = F.lit(int(round(frac * _BUCKETS)))
        cut = F.when(cond, val) if cut is None else cut.when(cond, val)
    default_cut = F.lit(int(round(default_fraction * _BUCKETS)))
    cut = default_cut if cut is None else cut.otherwise(default_cut)
    return bucket < cut


def stratified_topk_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    seed: int = 42,
    rank_col: str | None = None,
) -> DataFrame:
    """EXACTLY ``min(k, |stratum|)`` rows per stratum, deterministically
    chosen by key hash -- the exact-count sibling of
    :func:`stratified_hash_sample` (which is rate-based and only
    approximately sized). The training-data use cases are hard
    per-source caps ("at most k docs from any one domain", the
    RefinedWeb/C4 anti-head-domination rule) and balanced eval subsets
    ("exactly k per language"), where a rate cannot promise the count.

    Selection order is (md5(key#seed), key): reproducible across
    engines, partitionings, and reruns, and appending one stratum never
    disturbs another. ``rank_col`` optionally keeps the 1-based
    selection rank (cast long). ``key_col`` should be unique per row --
    duplicate keys make the order among those rows undefined.

    Scale shape: this is the one place a per-stratum window is RIGHT.
    A rank-limit filter over a window is rewritten by Catalyst (Spark
    >= 3.5) into WindowGroupLimit: every task pre-prunes to its local
    top-k BEFORE the shuffle, so a billion-row hot stratum ships
    ~partitions*k rows to its reducer, not a billion -- the two-phase
    threshold dance is already built into the optimizer (plan-gated in
    tests/test_plans.py).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = md5_60(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    out = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    if rank_col is None:
        return out.drop("__rn")
    return out.withColumn(rank_col, F.col("__rn").cast("long")).drop("__rn")


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by key hash; weights must sum to 1.

    Rows with equal ``key_col`` always land in the same split (hash the
    group key for leakage-free grouped splits)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(weights.items())
    for name, wgt in head:
        acc += wgt
        cond = bucket < int(round(acc * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn(split_col, expr)


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
    component_id_col: str = "id",
    component_col: str = "component",
) -> DataFrame:
    """Train/val/test split that near-duplicates cannot straddle.

    A plain ``hash_split`` on the document key leaks: a near-duplicate
    pair (MinHash Jaccard >= threshold) can land one copy in train and
    one in test, inflating eval scores (Lee et al. 2021 measured this
    on C4/Wiki40B). The fix is structural: hash the *dedup component
    representative*, not the document key -- every member of a
    near-dup cluster then shares a bucket and lands on the same side,
    whatever the weights.

    ``components`` is the (id, component) frame produced by
    ``operators.dedup.dedup_keep_list`` (min-id representative per
    connected component). Rows of ``df`` absent from ``components``
    fall back to hashing their own key -- a singleton is its own
    representative, so a partial components table degrades gracefully
    instead of dropping rows (LEFT join + coalesce).

    Scale shape: ONE equi-join on the document key (both sides keyed
    by id -- co-partitionable, and at 100 TB the components frame is
    the dedup pipeline's existing output, not a new computation), then
    the same zero-shuffle hash expression as ``hash_split``.
    """
    comp = components.select(
        F.col(component_id_col).alias("__cid"),
        F.col(component_col).alias("__comp"),
    )
    joined = df.join(comp, F.col(key_col) == F.col("__cid"), "left")
    grouped = joined.withColumn(
        "__group", F.coalesce(F.col("__comp"), F.col(key_col))
    ).drop("__cid", "__comp")
    return hash_split(grouped, "__group", weights, seed, split_col).drop(
        "__group"
    )


def mixture_with_epochs(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, float],
    target_rows: int,
    max_epochs: float = 4.0,
    seed: int = 42,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Domain mixture with TRUE upsampling: a domain whose corpus share
    is below its target share is replicated (the multi-epoch treatment
    scarce domains get in real pretraining mixes -- e.g. Wikipedia at
    3x epochs while Common Crawl is subsampled) instead of saturating
    at keep-all like :func:`mixture_hash_sample`.

    Per domain the target rate r = target_rows * w_d / n_d becomes
    floor(r) full copies plus one hash-filtered frac(r) partial copy,
    clamped at ``max_epochs`` (upsampling beyond a few epochs is
    memorization risk, so the cap is explicit and the realized shortfall
    is visible in the output counts). Rows gain an ``epoch_col``
    (0-based copy index) so downstream dedup/splitting can distinguish
    replicas; the (key, epoch) pair stays unique. For
    ``pack_sequences`` (whose layout is deterministic only under unique
    keys) derive a composite key first, e.g.
    ``F.col(key) * int(max_epochs + 1) + F.col("epoch")``.

    Determinism: full copies come from an explode over a literal
    sequence; the partial copy reuses the shared md5 hash cut with the
    epoch index salted into the seed. Zero shuffles."""
    if target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    if max_epochs < 1.0:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    for name, wgt in weights.items():
        if wgt < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {wgt}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")

    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full_expr = None  # number of guaranteed copies per domain
    cut_expr = None  # bucket cut for the one partial copy
    for name, wgt in weights.items():
        n_d = counts.get(name, 0)
        if n_d == 0:
            continue
        rate = min(max_epochs, target_rows * (wgt / total) / n_d)
        full = int(rate)
        frac_cut = int((rate - full) * _BUCKETS)  # floor, oracle-stable
        cond = F.col(domain_col) == name
        full_expr = (
            F.when(cond, full) if full_expr is None else full_expr.when(cond, full)
        )
        cut_expr = (
            F.when(cond, frac_cut)
            if cut_expr is None
            else cut_expr.when(cond, frac_cut)
        )
    if full_expr is None:
        return df.withColumn(epoch_col, F.lit(0).cast("long")).where(F.lit(False))

    out = df.withColumn("__full", full_expr.otherwise(F.lit(-1))).where(
        F.col("__full") >= 0
    )
    # epochs 0..full-1 are unconditional; epoch `full` keeps the hash
    # fraction. sequence(0, full) emits full+1 candidates; the last one
    # survives only under the cut (salted per-epoch so partial copies
    # of different epochs would be independent draws).
    out = out.withColumn(
        epoch_col, F.explode(F.sequence(F.lit(0), F.col("__full")))
    )
    partial = hash_bucket(
        F.concat(F.col(key_col).cast("string"), F.col(epoch_col).cast("string")),
        seed,
    ) < cut_expr.otherwise(F.lit(0))
    return (
        out.where((F.col(epoch_col) < F.col("__full")) | partial)
        .drop("__full")
        .withColumn(epoch_col, F.col(epoch_col).cast("long"))
    )


def temperature_weights(
    counts: dict[str, int], temperature: float
) -> dict[str, float]:
    """Target mixture weights ∝ share^temperature (the multilingual
    "temperature sampling" rule, e.g. XLM-R's alpha=0.3): temperature 1
    keeps the natural mixture, temperature → 0 approaches uniform,
    upweighting rare domains at the expense of dominant ones. Pure
    driver-side arithmetic over the tiny per-domain count dict."""
    if not 0.0 < temperature <= 1.0:
        raise ValueError(f"temperature must be in (0, 1], got {temperature}")
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("counts must sum to a positive value")
    raw = {d: (n / total) ** temperature for d, n in counts.items() if n > 0}
    z = sum(raw.values())
    return {d: w / z for d, w in raw.items()}


def temperature_hash_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    temperature: float,
    target_rows: int,
    seed: int = 42,
) -> DataFrame:
    """Resample toward the temperature-flattened domain mixture: one
    tiny count aggregation derives the weights (see
    :func:`temperature_weights`), then the keep decision is the usual
    zero-shuffle deterministic hash filter via
    :func:`mixture_hash_sample`. Domains too small for their flattened
    share saturate at keep-all (no duplication), exactly like an
    explicit-weights mixture."""
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return df.where(F.lit(False))
    weights = temperature_weights(counts, temperature)
    return mixture_hash_sample(
        df, key_col, domain_col, weights, target_rows, seed=seed, counts=counts
    )


def mixture_hash_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, float],
    target_rows: int,
    seed: int = 42,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Resample a corpus toward a target domain mixture: keep
    ~``target_rows * weights[d]`` rows of each domain ``d`` (the
    pretraining "data mixture" step -- e.g. upweight code/wiki, clamp
    common-crawl). Domains absent from ``weights`` are dropped.

    A domain whose corpus share is below its target share saturates
    (rate clamps at 1.0 -- this operator never duplicates rows, so the
    realized mixture is best-effort; re-weigh or add epochs upstream
    for true upsampling).

    Per-domain rates need per-domain counts: ONE tiny aggregation
    (|domains| rows to the driver), then the keep decision is the same
    zero-shuffle deterministic hash filter as the other samplers --
    rerun/repartition/append-stable, and exactly reproducible in SQL
    (cut = floor(rate * buckets) on the shared md5 bucket formula).
    """
    if target_rows < 0:
        raise ValueError(f"target_rows must be >= 0, got {target_rows}")
    for name, wgt in weights.items():
        if wgt < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {wgt}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")

    if counts is None:  # callers with the counts in hand skip the re-agg
        counts = {
            r["d"]: r["n"]
            for r in df.groupBy(F.col(domain_col).alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    bucket = hash_bucket(F.col(key_col), seed)
    cut = None
    for name, wgt in weights.items():
        n_d = counts.get(name, 0)
        if n_d == 0:
            continue
        rate = min(1.0, target_rows * (wgt / total) / n_d)
        val = F.lit(int(rate * _BUCKETS))  # floor, mirrored in the oracle
        cond = F.col(domain_col) == name
        cut = F.when(cond, val) if cut is None else cut.when(cond, val)
    if cut is None:
        return df.where(F.lit(False))
    return df.where(bucket < cut.otherwise(F.lit(0)))
