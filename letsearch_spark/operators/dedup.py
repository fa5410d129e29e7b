"""Deduplication operator family for large-scale training-data pipelines.

None of these exist in the reference (SURVEY.md §2.7) -- they are the
north-star operators from BASELINE.json, designed Spark-first for the
100 TB regime:

* exact_dedup         -- hash-groupBy on normalized text; one shuffle.
* ngram_jaccard_pairs -- shingle self-join; exact but O(pairs-sharing-a-
                         shingle); hot-shingle cutoff caps the skew.
* minhash_lsh_pairs   -- MinHash signatures in ONE shuffle (per-perm
                         hashes are columns, not rows), LSH banding join
                         for candidates, optional exact-Jaccard verify.
                         The scale path for near-dup dedup.
* incremental_minhash_dedup -- the same MinHash/LSH decision applied
                         batch-incrementally against a PERSISTED
                         signature store (minhash_band_table): each new
                         batch is signed once and banded-joined against
                         history; only colliding stored docs are ever
                         re-shingled. First-seen-wins keep rule.
* incremental_embedding_dedup -- the semantic sibling: persisted
                         sign-LSH bucket store (embedding_bucket_table),
                         exact cosine only on colliding pairs, stored
                         vectors fetched by candidate-id semi-join.
* simhash / simhash_pairs -- 32/64-bit SimHash; pair generation is
                         banded (pigeonhole: d <= k pairs must share one
                         of k+1 bit-bands), so no all-pairs join.
* embedding_cosine_pairs -- exact all-pairs (small/verification) or
                         sign-LSH bucketed (scale) cosine near-dup.

All hashing is md5-based (`conv(substr(md5(x),1,15),16,10)`) so results
are reproducible across engines and sessions -- this is what lets the
DuckDB oracle in queries.py hash-match these operators exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def md5_60(col):
    """Deterministic 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def words_of(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def normalize_text(col):
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


# ---------------------------------------------------------------- exact


def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Keep-list for exact duplicates: (keep_id, n_copies) per distinct
    (normalized) text. One shuffle, map-side partial aggregation free.

    At scale, group on the 60-bit hash instead of the full text to keep
    shuffle rows narrow -- collisions at 2^60 are negligible, but the
    text itself never travels."""
    key = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.groupBy(md5_60(key).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level exact dedup (the CCNet/C4 first pass -- the same page
    crawled twice usually differs only in tracking params, host case,
    fragments, default ports, a www. prefix or a trailing slash):
    one row per canonical URL (functions/text.py normalize_url) with
    ``(url_canon, keep_id, n_copies)``, keep = min id.

    Rows whose URL is null or has no host are EXCLUDED from the keep
    list (they have no canonical identity to collide on -- callers
    keep them unconditionally; the pipeline stage does exactly that).
    One shuffle, map-side partial aggregation free; the canonical
    string itself travels (distinct-URL level, already narrow) so the
    keep list can join back by value without re-canonicalizing."""
    from letsearch_spark.functions.text import normalize_url, url_host

    u = F.coalesce(F.col(url_col), F.lit(""))
    return (
        df.where(F.length(url_host(u)) > 0)
        .groupBy(normalize_url(u).alias("url_canon"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------- shingles


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, s) where ``s``
    is the 60-bit md5 integer of the shingle string (``md5_60``), not
    the raw string.

    explode + distinct = one shuffle on (id, shingle). Hashing BEFORE
    the distinct (r11, guide §2.3 narrower types) shuffles 8-byte longs
    instead of ~25-byte strings through every downstream distinct /
    self-join / aggregate -- ~4x fewer shuffle bytes at 100 TB -- and
    the md5 cost moves to the embarrassingly-parallel scan side. The
    md5_60 value is EXACTLY the base hash minhash_signatures already
    computed, so minhash signatures are unchanged; Jaccard /
    containment intersections now compare 60-bit hashes instead of
    strings, which differs only when two distinct shingles collide in
    60 bits (~1e-18 per pair -- the declared-query oracles replay the
    identical hash, queries.py _SHINGLES_SQL)."""
    words = words_of(F.col(text_col))
    mk = (
        f"transform(sequence(0, size(words)-{n}),"
        f" i -> CAST(conv(substring(md5("
        f"concat_ws(' ', slice(words, i + 1, {n}))"
        f"), 1, 15), 16, 10) AS BIGINT))"
    )
    return (
        df.select(F.col(id_col).alias("id"), words.alias("words"))
        .where(F.size("words") >= n)
        .select("id", F.explode(F.expr(mk)).alias("s"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via shingle self-join.

    ``max_shingle_freq`` drops shingles that occur in more than that many
    docs before the self-join -- the classic skew guard: a stop-phrase
    shared by 1M docs would otherwise produce 10^12 join rows. Dropping
    it biases Jaccard down slightly (documented; near-dup pairs share
    plenty of rare shingles)."""
    sh = shingles(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_shingle_freq)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sh = sh.cache()
    sh.count()  # materialize once for the 3 downstream consumers
    cnt = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "s")
    b = sh.select(F.col("id").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = cnt.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    corpus: DataFrame,
    probes: DataFrame,
    corpus_id: str,
    corpus_text: str,
    probe_id: str,
    probe_text: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Cross-corpus contamination check (benchmark decontamination): for
    each probe document (e.g. an eval/test item), find corpus documents
    (e.g. training data) whose shingle overlap COVERS the probe --
    containment = |shingles(corpus_doc) ∩ shingles(probe)| /
    |shingles(probe)|. Asymmetric on purpose: a long training document
    that embeds a short benchmark item verbatim scores 1.0 where Jaccard
    would dilute it to near zero.

    Same join geometry as ngram_jaccard_pairs: shingle equi-join with the
    hot-shingle cap (applied to the CORPUS side -- stop-phrases shared by
    everything would dominate both cost and score); at 100 TB the corpus
    side shuffles once on shingle and the probe side is usually small
    enough to broadcast its shingle set.

    Output: (corpus_id, probe_id, containment) with containment >=
    threshold, rounded to 6 (oracle parity).
    """
    ca = shingles(corpus, corpus_id, corpus_text, n).withColumnRenamed(
        "id", "corpus_id"
    )
    if max_shingle_freq is not None:
        hot = (
            ca.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_shingle_freq)
            .select("s")
        )
        ca = ca.join(F.broadcast(hot), "s", "left_anti")
    pb = shingles(probes, probe_id, probe_text, n).withColumnRenamed(
        "id", "probe_id"
    )
    pcnt = pb.groupBy("probe_id").agg(F.count(F.lit(1)).alias("np"))
    inter = (
        ca.join(pb, "s")
        .groupBy("corpus_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    containment = F.round(F.col("i") * 1.0 / F.col("np"), 6)
    return (
        inter.join(pcnt, "probe_id")
        .select("corpus_id", "probe_id", containment.alias("containment"))
        .where(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------- minhash

# Carter-Wegman affine permutations over a single md5 base hash: one md5
# per shingle (not one per shingle x perm), then h_p = (a_p*h + b_p) mod P.
# Constants sized so a_p*h fits in int64: h < 2^30, a_p < 2^31.
MINHASH_BASE_P = 1073741789  # largest prime < 2^30
MINHASH_PERM_P = 2147483629  # largest prime < 2^31


def minhash_perm_params(num_perms: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PERM_P), rng.randrange(0, MINHASH_PERM_P))
        for _ in range(num_perms)
    ]


def minhash_signatures(
    sh: DataFrame, num_perms: int = 16, seed: int = 42
) -> DataFrame:
    """(id, mh0..mh{P-1}) from a shingle set -- the base hash rides the
    already-hashed ``s`` column (:func:`shingles` emits md5_60 longs
    since r11; the ``% MINHASH_BASE_P`` fold is unchanged, so signature
    values are identical to the string-shingle era) plus 16 integer
    affine maps, all map-side columns, min-aggregated in a single
    shuffle on id."""
    params = minhash_perm_params(num_perms, seed)
    h = (F.col("s") % MINHASH_BASE_P).alias("h")
    base = sh.select("id", h)
    h_cols = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PERM_P).alias(f"mh{p}")
        for p, (a, b) in enumerate(params)
    ]
    return base.groupBy("id").agg(*h_cols)


def _bands_of(sig: DataFrame, num_perms: int, band_rows: int) -> DataFrame:
    """(id, band, sig) band table from a signature frame -- the unit the
    LSH bucket join keys on, and the persistable signature store for
    :func:`incremental_minhash_dedup`."""
    n_bands = num_perms // band_rows
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{p}").cast("string")
                    for p in range(bi * band_rows, (bi + 1) * band_rows)
                ],
            ).alias("sig"),
        )
        for bi in range(n_bands)
    ]
    return sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perms: int = 16,
    band_rows: int = 2,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """MinHash/LSH near-dup pairs; with ``verify`` the candidates are
    checked against exact Jaccard (output: id_a, id_b, jaccard), else
    raw candidates (id_a, id_b)."""
    sh = shingles(df, id_col, text_col, n).cache()
    sh.count()  # materialize once; 4 downstream consumers read the cache
    sig = minhash_signatures(sh, num_perms)
    bands = _bands_of(sig, num_perms, band_rows)
    a = bands.select(F.col("id").alias("id_a"), "band", "sig")
    b = bands.select(F.col("id").alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if not verify:
        return cand
    cnt = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("id").alias("id_a"), "s")
    sb = sh.select(F.col("id").alias("id_b"), "s")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = cnt.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        cand.join(inter, ["id_a", "id_b"], "left")
        .join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.coalesce(jac, F.lit(0.0)), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )



def _incr_candidates(new_tbl, store_tbl, join_cols: list) -> DataFrame:
    """(id_new, id_other) collision candidates for the incremental dedup
    protocol: batch-internal pairs against LOWER ids plus cross-store
    pairs, deduplicated. ``new_tbl``/``store_tbl`` are (id, *join_cols)
    collision tables (MinHash bands or LSH buckets)."""
    a = new_tbl.select(F.col("id").alias("id_new"), *join_cols)
    intra = (
        a.join(
            new_tbl.select(F.col("id").alias("id_other"), *join_cols),
            join_cols,
        )
        .where(F.col("id_other") < F.col("id_new"))
        .select("id_new", "id_other")
    )
    cand = intra
    if store_tbl is not None:
        cross = a.join(
            store_tbl.select(F.col("id").alias("id_other"), *join_cols),
            join_cols,
        ).select("id_new", "id_other")
        cand = cand.unionByName(cross)
    return cand.distinct()


def _incr_old_hits(cand, new_ids, corpus, id_col: str, strict: bool, what: str):
    """Corpus rows for the STORED side of the candidate pairs (None when
    no corpus frame was given). The strict store-coverage check is ONE
    count over the candidate id set anti-joined against the corpus."""
    old_needed = cand.select(F.col("id_other").alias("id")).join(
        new_ids, "id", "left_anti"
    )
    if corpus is None:
        if strict and old_needed.first() is not None:
            raise ValueError(
                f"the store matched candidates but {what} is None: "
                "stored entries cannot be verified"
            )
        return None
    if strict:
        missing = old_needed.join(
            corpus.select(F.col(id_col).alias("id")), "id", "left_anti"
        ).count()
        if missing:
            raise ValueError(
                f"{missing} stored candidate ids are missing from {what}; "
                "their collisions cannot be verified (the store must "
                "cover every processed id)"
            )
    return corpus.join(
        F.broadcast(old_needed.withColumnRenamed("id", id_col)), id_col
    )


def _first_seen_keep(new_ids, dups, id_col: str) -> DataFrame:
    """(id, keep, dup_of) from verified duplicate pairs: a new id is
    dropped when any pair names it, dup_of = the smallest partner."""
    matches = dups.groupBy("id_new").agg(F.min("id_other").alias("dup_of"))
    return (
        new_ids.join(matches.withColumnRenamed("id_new", "id"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perms: int = 16,
    band_rows: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(id, band, sig) for every document -- the persistable signature
    store :func:`incremental_minhash_dedup` joins new batches against.
    Write it partitioned however the store is queried (plain parquet is
    fine: the incremental join keys on (band, sig), both low-cardinality
    enough to shuffle cheaply)."""
    sh = shingles(df, id_col, text_col, n)
    return _bands_of(minhash_signatures(sh, num_perms, seed), num_perms, band_rows)


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store_bands: DataFrame | None,
    corpus_docs: DataFrame | None,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perms: int = 16,
    band_rows: int = 2,
    threshold: float = 0.5,
    seed: int = 42,
    strict: bool = True,
) -> dict[str, DataFrame]:
    """Near-dup dedup of an incoming batch against everything already
    seen -- the batch-incremental MinHash shape an append-heavy 100 TB
    ingest needs (and the near-dup analog of streaming/stateful.py's
    exact ``streaming_dedup``): signatures of history are PERSISTED
    (``store_bands``, built by :func:`minhash_band_table`), so each new
    batch costs one signature pass over the batch plus a banded join
    against the store -- history is never re-shingled wholesale.

    Decision rule ("first seen wins"): a new document is a duplicate
    when exact Jaccard >= ``threshold`` against (a) any stored document
    or (b) any lower-id document in the same batch. Verification
    re-shingles ONLY the stored documents that collide in some band
    (a semi-join of ``corpus_docs`` on the candidate ids -- bounded by
    candidate count, not corpus size).

    Contract: ids are unique across store + batch (append key
    continuation gives this for free), and every id in ``store_bands``
    must be resolvable in ``corpus_docs`` -- the store remembers ALL
    previously processed docs (kept or dropped), matching the
    first-seen-wins rule, and raw inputs are retained in practice. With
    ``strict`` (default) an unresolvable candidate id raises instead of
    silently failing verification as "not a duplicate" (one count over
    the candidate id set), and a store whose band count contradicts the
    num_perms/band_rows knobs raises too.

    Returns ``{"keep": (id, keep, dup_of), "bands": (id, band, sig),
    "release": <callable>}``. Append ``bands`` (all of them, not just
    kept) to the store for the next batch; route ``keep`` wherever the
    keep-list goes; after materializing both, call ``result["release"]()``
    -- the batch shingles and the candidate table are cached because
    several plan branches read them, and a long-running foreachBatch
    driver that never releases them would accumulate cached tables
    every micro-batch. Two batches through this function
    equal one :func:`minhash_lsh_pairs` run over the union under the
    same drop-if-any-lower-id-pair rule (equivalence pinned by
    test_incremental_minhash_matches_batch).
    """
    new_sh = shingles(new_docs, id_col, text_col, n).cache()
    new_bands = _bands_of(
        minhash_signatures(new_sh, num_perms, seed), num_perms, band_rows
    )
    if store_bands is not None and strict:
        # structural store-compat guard: a store built with different
        # num_perms/band_rows has a different band count and can never
        # collide correctly. One column-pruned max() per batch. (A
        # different SEED or shingle n is structurally invisible --
        # store and call sites must agree on those by contract.)
        mb = store_bands.agg(F.max("band")).first()[0]
        expected = num_perms // band_rows - 1
        if mb is not None and int(mb) != expected:
            raise ValueError(
                f"store_bands has bands 0..{int(mb)} but num_perms="
                f"{num_perms}/band_rows={band_rows} imply 0..{expected}: "
                "the store was built with different banding knobs"
            )

    # cand is read by several plan branches (strict check, intersection,
    # verify join); cache it and hand the caller a release() hook
    cand = _incr_candidates(new_bands, store_bands, ["band", "sig"]).cache()

    # shingles for the "other" side: new ids read the cached batch
    # shingles; stored ids re-shingle only the colliding corpus docs
    other_sh = new_sh
    if store_bands is not None:
        hit_docs = _incr_old_hits(
            cand,
            new_docs.select(F.col(id_col).alias("id")),
            corpus_docs,
            id_col,
            strict,
            "corpus_docs",
        )
        if hit_docs is not None:
            other_sh = new_sh.unionByName(
                shingles(hit_docs, id_col, text_col, n)
            )

    cnt_new = new_sh.groupBy("id").agg(F.count(F.lit(1)).alias("na"))
    cnt_other = other_sh.groupBy("id").agg(F.count(F.lit(1)).alias("nb"))
    sa = new_sh.select(F.col("id").alias("id_new"), "s")
    sb = other_sh.select(F.col("id").alias("id_other"), "s")
    inter = (
        cand.join(sa, "id_new")
        .join(sb, ["id_other", "s"])
        .groupBy("id_new", "id_other")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
    dups = (
        cand.join(inter, ["id_new", "id_other"], "left")
        .join(cnt_new.withColumnRenamed("id", "id_new"), "id_new")
        .join(cnt_other.withColumnRenamed("id", "id_other"), "id_other")
        .select(
            "id_new",
            "id_other",
            F.round(F.coalesce(jac, F.lit(0.0)), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    keep = _first_seen_keep(
        new_docs.select(F.col(id_col).alias("id")), dups, id_col
    )

    def release() -> None:
        new_sh.unpersist()
        cand.unpersist()

    return {"keep": keep, "bands": new_bands, "release": release}


# ---------------------------------------------------------------- simhash


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash): md5-keyed SimHash, +-1 per token occurrence.
    One explode + one shuffle on id; the per-bit sums are columns.

    ``bits`` is capped at 60: the token hash carries 60 bits (md5_60),
    and bit 63 would overflow a Java long literal anyway."""
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60], got {bits}")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(words_of(F.col(text_col))).alias("w")
    ).where(F.col("w") != "")
    h = md5_60(F.col("w"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return agg.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    banded: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banded (default): split the fingerprint into ``max_hamming + 1``
    bit-bands; any pair within distance d <= max_hamming agrees exactly
    on at least one band (pigeonhole), so joining per-band on band
    equality finds ALL such pairs without an all-pairs product. Results
    are identical to brute force; only the join geometry changes."""
    sh = simhash(df, id_col, text_col, bits).cache()
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    if not banded:
        a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
        b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
        return (
            a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
        )

    n_bands = max_hamming + 1
    width = (bits + n_bands - 1) // n_bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.shiftright(F.col("simhash"), bi * width)
            .bitwiseAND(F.lit(mask))
            .alias("bkey"),
        )
        for bi in range(n_bands)
    ]
    bands = sh.select(
        "id",
        F.col("simhash"),
        F.explode(F.array(*band_structs)).alias("bs"),
    ).select(
        "id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey")
    )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("ha"), "band", "bkey"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("hb"), "band", "bkey"
    )
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------------- components


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Component label per node from a near-dup pair graph: (id, component)
    where component = min node id reachable from id. The last stage of a
    real dedup pipeline: pairs -> clusters -> one canonical doc per
    cluster (component == id).

    algorithm='minlabel' (default): labels start as own id; each round
    every node takes the min of its label and its neighbors' labels.
    Converges in `diameter` rounds -- near-dup components from LSH
    banding are near-cliques (diameter 2-3), so 3-4 shuffle rounds in
    practice, each round one join + one groupBy on the *pair* table only
    (nodes outside any pair never enter the loop). Convergence: numeric
    ids use the monotonically-decreasing sum of labels (one cheap agg
    per round); non-numeric ids (string keys...) use an exact label-diff
    join instead, so any orderable id type works;
    `localCheckpoint` truncates the growing lineage each round
    (essential for iterative Spark plans).

    algorithm='star': alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    O(log n) rounds independent of diameter -- the shape for adversarial
    long-chain graphs where minlabel would need diameter rounds. Same
    output contract.

    ``nodes``: optional (id) DataFrame; ids absent from ``pairs`` are
    emitted as singleton components (component = own id).
    """
    if algorithm == "star":
        return _components_star(pairs, nodes, id_a, id_b, max_iter)
    if algorithm != "minlabel":
        raise ValueError(f"algorithm must be minlabel|star, got {algorithm!r}")
    a = F.col(id_a).alias("src")
    b = F.col(id_b).alias("dst")
    edges = (
        pairs.select(a, b)
        .union(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(labels.schema["label"].dataType, NumericType)
    prev_sum = (
        labels.agg(F.sum("label")).first()[0] if numeric_ids else None
    )
    converged = False
    for _ in range(max_iter):
        neighbor = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "label")
        new_labels = (
            labels.union(neighbor)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        if numeric_ids:
            # labels only min-decrease, so the sum is a monotone exact
            # fixed-point signal -- one cheap single-column agg/round
            cur_sum = new_labels.agg(F.sum("label")).first()[0]
            changed = cur_sum != prev_sum
            prev_sum = cur_sum
        else:
            # non-numeric ids (string keys...) have no sum; the exact
            # check is a label-diff join over the pair-member-sized
            # label table (the old sum cast strings and failed analysis)
            changed = bool(
                new_labels.join(
                    labels.withColumnRenamed("label", "_prev"), "id"
                )
                .where(~F.col("label").eqNullSafe(F.col("_prev")))
                .limit(1)
                .count()
            )
        labels = new_labels
        if not changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # a silently-unconverged result would hand back WRONG labels;
        # graphs with diameter > max_iter need algorithm='star'
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iter} rounds "
            f"(graph diameter exceeds max_iter); use algorithm='star' or "
            f"raise max_iter"
        )
    out = labels.select("id", F.col("label").alias("component"))
    if nodes is not None:
        singles = (
            nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(out.select("id"), "id", "left_anti")
            .withColumn("component", F.col("id"))
        )
        out = out.union(singles)
    return out


def _components_star(
    pairs: DataFrame,
    nodes: DataFrame | None,
    id_a: str,
    id_b: str,
    max_iter: int,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.):
    each round every node hooks its larger neighbors (large-star) then
    its smaller-or-equal neighbors (small-star) onto the minimum of its
    neighborhood. Component trees halve in height every round -> O(log n)
    rounds on ANY graph shape, vs diameter rounds for min-label."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )  # orientation: u (larger) -> v (smaller); column order (u, v)
    # matters: the unions below are positional

    def large_star(e):
        # full (undirected) adjacency per center; hook every LARGER
        # neighbor onto the neighborhood minimum
        adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = adj.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
        out = (
            adj.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    def small_star(e):
        # DIRECTED (larger -> smaller) edges only: hook each center and
        # its smaller neighbors onto the minimum of that directed set
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            e.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
        return out.where(F.col("u") != F.col("v")).distinct()

    def signature(e):
        # order-invariant edge-set fingerprint: (count, XOR of a 60-bit
        # md5 per edge) -- XOR-folding cannot overflow and a collision
        # would need two DIFFERENT distinct-edge sets with equal count
        # and equal fold (~2^-60); the old (count, sum_u, sum_v) tuple
        # collided for trivially-rearranged sets and could break the
        # loop early with a non-star forest.
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.conv(
                    F.substring(F.md5(F.concat_ws(",", "u", "v")), 1, 15), 16, 10
                ).cast("long")
            ).alias("h"),
        ).first()
        return (r["n"], r["h"])

    sig = signature(edges)
    converged = False
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        new_sig = signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # an unconverged edge set is NOT a star forest: interior tree
        # nodes would appear both as sources and as roots below,
        # yielding duplicate conflicting (id, component) rows -- same
        # contract as minlabel: refuse loudly instead
        raise RuntimeError(
            f"star contraction did not reach a fixed point in {max_iter} "
            f"rounds; raise max_iter"
        )

    # fixed point is a star forest: every edge is (node, root)
    roots = edges.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    out = edges.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    ).union(roots)
    if nodes is not None:
        singles = (
            nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(out.select("id"), "id", "left_anti")
            .withColumn("component", F.col("id"))
        )
        out = out.union(singles)
    return out


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iter: int = 20,
    algorithm: str = "minlabel",
) -> DataFrame:
    """(id, component, is_kept) over ALL docs: one canonical survivor
    (the min id) per near-dup cluster, singletons kept as themselves.
    Downstream: ``docs.join(keep.where("is_kept"), id)`` drops dups."""
    comp = connected_components(
        pairs, nodes=docs.select(id_col), max_iter=max_iter, algorithm=algorithm
    )
    return comp.select(
        "id", "component", (F.col("id") == F.col("component")).alias("is_kept")
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    max_iter: int = 20,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Quality-aware survivor selection: (id, component, is_kept) over
    ALL docs where the survivor of each near-dup cluster is the member
    with the HIGHEST ``score_col`` (ties -> lowest id), instead of
    :func:`dedup_keep_list`'s arbitrary min-id rule. This is what
    production web pipelines actually do -- when a page and its mirror
    collide, keep the longer / higher-quality copy, not whichever got
    the smaller ingest key (FineWeb and RefinedWeb both pick cluster
    representatives by quality signals, not key order).

    ``score_col`` is any per-doc quality signal already in ``docs``
    (char count, classifier score, perplexity negated...). Null scores
    lose to any non-null score (coalesced to -inf). ``id_col`` may be
    any orderable type (long, string, ...) -- the tie-break is the
    column's natural MIN, not numeric negation. Pair ids absent from
    ``docs`` have no score and are dropped (the pairs table is expected
    to be derived FROM ``docs``; feed the same frame to both).

    Scale shape: components run over PAIR MEMBERS only (the dup subset,
    not the corpus); the score join and the per-component argmax touch
    only that subset, and the argmax is two real aggregates with
    map-side partials (max score per component, then min id among the
    max-score members), so a mega-cluster never single-tasks. The
    corpus-sized step is one hash-only left-anti join that emits
    singletons as their own survivors.
    """
    comp = connected_components(
        pairs, nodes=None, max_iter=max_iter, algorithm=algorithm
    )
    scores = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf"))).alias(
            "_score"
        ),
    )
    scored = comp.join(scores, "id")
    # argmax as two partial-aggregable steps, type-agnostic in id:
    # max score per component, then the smallest id at that score
    best_score = scored.groupBy("component").agg(
        F.max("_score").alias("_best_score")
    )
    best = (
        scored.join(best_score, "component")
        .where(F.col("_score") == F.col("_best_score"))
        .groupBy("component")
        .agg(F.min("id").alias("_best"))
    )
    dup_rows = scored.join(best, "component").select(
        "id", "component", (F.col("id") == F.col("_best")).alias("is_kept")
    )
    singles = (
        docs.select(F.col(id_col).alias("id"))
        .join(comp.select("id"), "id", "left_anti")
        .select(
            "id",
            F.col("id").alias("component"),
            F.lit(True).alias("is_kept"),
        )
    )
    return dup_rows.unionByName(singles)


# ------------------------------------------------------------ embeddings


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    method: str = "exact",
    lsh_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    pca=None,
) -> DataFrame:
    """Embedding near-dup pairs (cosine >= threshold).

    method='exact': all-pairs with precomputed norms (one dot per pair).
    method='lsh': sign-LSH bucket the vectors first and compare only
    same-bucket pairs -- approximate (misses cross-bucket pairs, recall
    rises with multiprobe) but turns O(n^2) into O(sum bucket^2).

    ``pca`` (r9): optional pre-projection (int k to fit here, or a
    fitted operators/pca.py PCAModel) -- the bucket join then carries
    k-dim vectors instead of full-dim (4x fewer shuffle bytes at
    64->16) and every pair dot costs k muls. Similarities are computed
    in the REDUCED space, where cosines are INFLATED (projection drops
    each vector's orthogonal mass): near-dup thresholds (>=0.9) hold
    recall and precision even at small k, but loose thresholds
    hallucinate pairs on flat-spectrum data -- keep k large or stay
    full-dim there (measured table in SCALING.md r9)."""
    if pca is not None:
        from letsearch_spark.operators.pca import resolve_projection

        df, _model = resolve_projection(df, vec_col, pca)
        dim = _model.k
    from letsearch_spark.functions.vector import dot_product, l2_norm

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    if method == "lsh":
        from letsearch_spark.operators.topk import _hyperplanes, lsh_signature_col

        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = _hyperplanes(dim, lsh_bits, seed)
        base = base.withColumn("_bucket", lsh_signature_col(F.col("v"), planes))
        join_on = [F.col("a._bucket") == F.col("b._bucket")]
    else:
        join_on = []

    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for extra in join_on:
        cond = cond & extra
    sim = dot_product(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def embedding_bucket_table(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    lsh_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(id, bucket) sign-LSH bucket table -- the persistable store for
    :func:`incremental_embedding_dedup`. The hyperplanes are a pure
    function of (dim, lsh_bits, seed), so the store needs no sidecar:
    any later batch regenerates identical planes from the same knobs."""
    from letsearch_spark.operators.topk import _hyperplanes, lsh_signature_col

    if dim is None:
        probe = df.select(vec_col).first()
        if probe is None:
            raise ValueError(
                "cannot infer the vector dim from an empty frame; pass dim"
            )
        dim = len(probe[0])
    planes = _hyperplanes(dim, lsh_bits, seed)
    return df.select(
        F.col(id_col).alias("id"),
        lsh_signature_col(F.col(vec_col), planes).alias("bucket"),
    )


def incremental_embedding_dedup(
    new_vecs: DataFrame,
    store_buckets: DataFrame | None,
    corpus_vecs: DataFrame | None,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    lsh_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    strict: bool = True,
) -> dict[str, DataFrame]:
    """Embedding near-dup dedup of an incoming batch against everything
    already seen -- the semantic sibling of
    :func:`incremental_minhash_dedup` (same store/first-seen-wins
    contract; read that docstring for the protocol). History persists
    as the (id, bucket) table from :func:`embedding_bucket_table`; a
    new batch is bucketed once, joined against the store bucket-wise,
    and exact cosine runs only on colliding pairs, with the stored
    side's vectors fetched by a semi-join of ``corpus_vecs`` on the
    (bounded) candidate ids.

    Approximate exactly like ``embedding_cosine_pairs(method='lsh')``:
    a near-dup whose vector lands in a different bucket is missed;
    recall follows the same lsh_bits knob. Two batches equal one batch
    run of that operator over the union under the shared
    drop-if-any-lower-id-pair rule (pinned by
    test_incremental_embedding_matches_batch).

    Returns ``{"keep": (id, keep, dup_of), "buckets": (id, bucket),
    "release": <callable>}``; append ``buckets`` (all rows) to the
    store and call ``release()`` after materializing the outputs (same
    cache protocol as the MinHash sibling). An empty batch returns
    empty frames instead of failing dim inference.
    """
    from letsearch_spark.functions.vector import dot_product, l2_norm

    if dim is None:
        probe = new_vecs.select(vec_col).first()
        if probe is None:
            # empty micro-batch (idle trigger, restart replay): nothing
            # to judge and no vector to infer dim from -- empty outputs
            spark = new_vecs.sparkSession
            id_type = new_vecs.schema[id_col].dataType.simpleString()
            return {
                "keep": spark.createDataFrame(
                    [], f"{id_col} {id_type}, keep boolean, dup_of {id_type}"
                ),
                "buckets": spark.createDataFrame(
                    [], f"id {id_type}, bucket int"
                ),
                "release": lambda: None,
            }
        dim = len(probe[0])

    new_b = embedding_bucket_table(
        new_vecs, id_col, vec_col, lsh_bits, dim, seed
    )
    if store_buckets is not None and strict:
        # partial structural guard: a store built with MORE lsh_bits has
        # bucket ids outside [0, 2^lsh_bits) and can never collide
        # correctly. (Fewer bits, a different seed, or a different dim
        # are structurally invisible -- by contract the store and every
        # call share those knobs.) One column-pruned max() per batch.
        mbkt = store_buckets.agg(F.max("bucket")).first()[0]
        if mbkt is not None and int(mbkt) >= (1 << lsh_bits):
            raise ValueError(
                f"store_buckets holds bucket id {int(mbkt)} >= "
                f"2^{lsh_bits}: the store was built with more lsh_bits "
                "than this call"
            )

    cand = _incr_candidates(new_b, store_buckets, ["bucket"]).cache()

    vec_of = lambda frame: frame.select(  # noqa: E731
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    vnew = vec_of(new_vecs)
    vother = vnew
    if store_buckets is not None:
        hit_vecs = _incr_old_hits(
            cand,
            new_vecs.select(F.col(id_col).alias("id")),
            corpus_vecs,
            id_col,
            strict,
            "corpus_vecs",
        )
        if hit_vecs is not None:
            vother = vnew.unionByName(vec_of(hit_vecs))

    sim = dot_product(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    dups = (
        cand.join(vnew.alias("a"), cand["id_new"] == F.col("a.id"))
        .join(vother.alias("b"), cand["id_other"] == F.col("b.id"))
        .select("id_new", "id_other", F.round(sim, 6).alias("sim"))
        .where(F.col("sim") >= threshold)
    )
    keep = _first_seen_keep(
        new_vecs.select(F.col(id_col).alias("id")), dups, id_col
    )
    return {"keep": keep, "buckets": new_b, "release": cand.unpersist}


# ------------------------------------------------------------ lines


def remove_duplicate_lines(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_occurrences: int = 1,
    min_line_chars: int = 1,
) -> DataFrame:
    """C4-style corpus-level duplicate-line removal (Raffel et al. 2020
    §2.2): a line that occurs in more than ``max_occurrences`` documents
    is kept only in the lowest-key document and stripped everywhere
    else. Boilerplate (nav bars, license headers, cookie banners)
    dominates web corpora by exactly this shape.

    Lines shorter than ``min_line_chars`` (after trim) are exempt --
    blank lines and stray punctuation are structure, not boilerplate.
    Line identity is the exact trimmed line (case-sensitive).

    Output: one row per input document --
    (``key_col``, ``text_col`` cleaned, ``n_lines``, ``n_removed``).
    Documents whose every line is stripped come back with empty text
    (downstream length filters drop them).

    Scale shape (the part that matters at 100 TB): the occurrence
    count and keeper choice are AGGREGATED over a 60-bit line hash --
    that stats shuffle never carries line text, and skew on
    mega-duplicated lines is absorbed by its map-side partials. Line
    text crosses the wire once for the per-document reassembly (and in
    the verdict join's probe side if the duplicated-line stats table
    ever outgrows the broadcast threshold). No all-pairs anything.
    """
    lines = df.select(
        F.col(key_col).alias("__k"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("__pos", "__line"),
    ).withColumn("__exempt", F.length(F.trim(F.col("__line"))) < min_line_chars)
    hashed = lines.withColumn("__h", md5_60(F.trim(F.col("__line"))))

    stats = (
        hashed.where(~F.col("__exempt"))
        .groupBy("__h")
        .agg(
            F.countDistinct("__k").alias("__n_docs"),
            F.min("__k").alias("__keeper"),
        )
        .where(F.col("__n_docs") > max_occurrences)
    )

    judged = hashed.join(stats, "__h", "left").withColumn(
        "__keep",
        F.col("__exempt")
        | F.col("__n_docs").isNull()
        | (F.col("__k") == F.col("__keeper")),
    )

    rebuilt = judged.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias("n_removed"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("__pos"), F.col("__line")),
                        )
                    )
                ),
                lambda s: s.getField("__line"),
            ),
        ).alias("text"),
    )
    return rebuilt.select(
        F.col("__k").alias(key_col),
        F.col("text").alias(text_col),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


def remove_duplicate_ngrams(
    df: DataFrame,
    key_col: str,
    text_col: str,
    width: int = 50,
    max_occurrences: int = 1,
) -> DataFrame:
    """Span-level exact substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): a ``width``-word
    sequence that occurs in more than ``max_occurrences`` documents is
    kept only in the lowest-key document; every word position covered by
    such a sequence is stripped everywhere else. The span-level
    complement of :func:`remove_duplicate_lines` -- catches boilerplate
    that ignores line structure (flowed license text, templated intros,
    quoted chain-mail).

    Word identity is exact (case-sensitive) on ASCII-whitespace splits;
    output text is the surviving words joined by single spaces (original
    whitespace is NOT preserved -- span surgery has no line structure to
    restore), one row per input document:
    (``key_col``, ``text_col`` cleaned, ``n_words``, ``n_removed``).
    Documents with null text are dropped (same as line dedup); documents
    shorter than ``width`` words have no spans and pass through (words
    re-joined).

    Scale shape: the per-position ``width``-gram keys are 60-bit hashes
    of word-hash windows, so the stats shuffle carries (hash, key)
    pairs -- never text -- and its map-side partials absorb hot-gram
    skew. The O(n·width) window-hash cost is the same multiplier the
    MinHash shingler pays, all map-side. Only HOT span starts (rare by
    definition) explode into their ``width`` covered positions; clean
    documents never produce more than one row per word.
    """
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    from letsearch_spark.tokenizer import split_words

    words = df.select(
        F.col(key_col).alias("__k"),
        F.posexplode(split_words(F.col(text_col))).alias("__pos", "__w"),
    )
    # hash words first so window hashing concatenates fixed 15-char
    # tokens instead of unbounded words
    wh = words.withColumn(
        "__wh", F.substring(F.md5(F.col("__w")), 1, 15)
    )
    # per-doc word-hash array -> one 60-bit key per window start
    per_doc = wh.groupBy("__k").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__pos"), F.col("__wh")))
        ).alias("__ws")
    ).select(
        "__k",
        F.transform(F.col("__ws"), lambda s: s.getField("__wh")).alias("__hs"),
    )
    grams = per_doc.select(
        "__k",
        F.posexplode(
            F.when(
                F.size("__hs") >= width,
                F.transform(
                    F.sequence(F.lit(0), F.size("__hs") - width),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ",", F.slice(F.col("__hs"), i + 1, width)
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long"),
                ),
            ).otherwise(F.array().cast("array<long>")),
        ).alias("__start", "__g"),
    )
    stats = (
        grams.groupBy("__g")
        .agg(
            F.countDistinct("__k").alias("__n_docs"),
            F.min("__k").alias("__keeper"),
        )
        .where(F.col("__n_docs") > max_occurrences)
    )
    hot_starts = grams.join(stats, "__g").where(
        F.col("__k") != F.col("__keeper")
    )
    covered = hot_starts.select(
        "__k",
        F.explode(
            F.sequence(F.col("__start"), F.col("__start") + width - 1)
        ).alias("__pos"),
    ).distinct()

    judged = words.join(covered, ["__k", "__pos"], "left_anti")
    totals = words.groupBy("__k").agg(F.count(F.lit(1)).alias("n_words"))
    rebuilt = judged.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__w")))
                ),
                lambda s: s.getField("__w"),
            ),
        ).alias("__text"),
    )
    # base frame keeps zero-word documents alive (empty text, 0 counts)
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(key_col).alias("__k")
    )
    return (
        base.join(totals, "__k", "left")
        .join(rebuilt, "__k", "left")
        .select(
            F.col("__k").alias(key_col),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            (
                F.coalesce(F.col("n_words"), F.lit(0))
                - F.coalesce(F.col("__kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every ``k``-word gram, then keep the MINIMUM hash
    of each sliding window of ``w`` consecutive gram hashes. The
    selected value set is a sparse signature with the winnowing
    guarantee: any shared run of at least ``w + k - 1`` words produces
    at least one shared fingerprint -- a detection GUARANTEE where
    MinHash gives a probability.

    Output: (id, fp) distinct pairs, ~1/w the density of full
    shingling. All Catalyst: the gram hashes and window minima are
    array transforms over the per-doc word-hash array (O(words·(k+w))
    map-side work, same multiplier family as the MinHash shingler);
    docs shorter than k + w - 1 words emit nothing."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    from letsearch_spark.tokenizer import split_words

    words_df = df.select(
        F.col(id_col).alias("__k"),
        F.posexplode(split_words(F.col(text_col))).alias("__pos", "__w"),
    ).withColumn("__wh", F.substring(F.md5(F.col("__w")), 1, 15))
    per_doc = (
        words_df.groupBy("__k")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__wh")))
            ).alias("__ws")
        )
        .select(
            "__k",
            F.transform(F.col("__ws"), lambda s: s.getField("__wh")).alias(
                "__hs"
            ),
        )
        .where(F.size("__hs") >= k + w - 1)
    )
    grams = per_doc.select(
        "__k",
        F.transform(
            F.sequence(F.lit(0), F.size("__hs") - k),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat_ws(",", F.slice(F.col("__hs"), i + 1, k))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        ).alias("__gs"),
    )
    mins = grams.select(
        "__k",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__gs") - w),
                lambda j: F.array_min(F.slice(F.col("__gs"), j + 1, w)),
            )
        ).alias("fp"),
    ).distinct()
    return mins.select(F.col("__k").alias(id_col), "fp")


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_docs: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs by shared winnowing fingerprints:
    (id_a, id_b, n_shared) with id_a < id_b and at least ``min_shared``
    common fingerprints. ``max_fp_docs`` drops fingerprints present in
    more documents than that (the hot-shingle skew guard this module
    uses everywhere -- a boilerplate fingerprint in 10^6 docs would
    otherwise square)."""
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_fp_docs)
        .select("fp")
    )
    cold = fps.join(hot, "fp", "left_anti")
    a = cold.select(F.col("fp"), F.col(id_col).alias("__a"))
    b = cold.select(F.col("fp"), F.col(id_col).alias("__b"))
    return (
        a.join(b, "fp")
        .where(F.col("__a") < F.col("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .select(
            F.col("__a").alias(f"{id_col}_a"),
            F.col("__b").alias(f"{id_col}_b"),
            F.col("n_shared").cast("long").alias("n_shared"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nlist: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_limit: int = 100_000,
    centroids=None,
    pca=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster-then-compare over
    an embedding column, after Abbas et al. 2023): spherical k-means
    clusters the vectors, then an item is dropped when some LOWER-id
    member of the SAME cluster has cosine similarity >= ``threshold`` --
    the min-id representative of each semantic duplicate group survives,
    the keep rule every other dedup operator here uses.

    Returns (id, cluster, keep).

    Scale design: the quadratic comparison runs ONLY within a cluster --
    one shuffle keyed by cluster id, then a per-cluster numpy matmul
    inside applyInPandas (no cross-cluster pairs ever exist). Choose
    ``nlist`` so the expected cluster size stays executor-bounded: at
    1B docs and nlist=100k, ~10k members -> a 10k x 10k in-memory
    similarity block per task. Centroid training collects a bounded
    key-sorted sample (deterministic across partitionings, same core as
    operators/ann.py IVF training); pass precomputed ``centroids`` to
    skip training and keep the whole plan lazy.

    Null/zero vectors: rows with a NULL vector are dropped before
    clustering (they have no semantic identity); zero vectors normalize
    to themselves and land in one cluster, where cos=0 keeps them all.

    ``pca`` (r9): optional pre-projection (int k or a fitted
    operators/pca.py PCAModel) applied before clustering AND the
    within-cluster comparison -- the cluster-keyed exchange then
    carries k-dim vectors (4x fewer bytes at 64->16) and each
    cluster's numpy similarity block shrinks the same way. The keep
    decision moves to reduced-space cosine, where angles shrink
    (projection inflates cosines): at this operator's near-dup
    thresholds (>=0.9) the keep-list agrees with full-dim even at
    small k on worst-case isotropic data; at loose thresholds it
    over-drops -- measured table in SCALING.md r9. Precomputed
    ``centroids`` must live in the same space as the projection.
    """
    import numpy as np
    import pandas as pd

    from letsearch_spark.operators.ann import assign_lists, train_centroids

    if pca is not None:
        from letsearch_spark.operators.pca import resolve_projection

        df, _ = resolve_projection(df, vec_col, pca)
    clean = df.select(id_col, vec_col).where(F.col(vec_col).isNotNull())
    # carry the caller's id type through (string ids are as legal as
    # longs); hardcoding `long` here would surface as an opaque Arrow
    # type error inside applyInPandas instead of just working
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, cluster long, keep boolean"
    if centroids is None:
        if clean.first() is None:  # empty/all-null input -> empty output
            return df.sparkSession.createDataFrame([], out_schema)
        centroids = train_centroids(
            clean,
            nlist=nlist,
            vec_col=vec_col,
            sample_limit=sample_limit,
            iters=iters,
            seed=seed,
            key_col=id_col,
        )
    assigned = assign_lists(clean, centroids, vec_col=vec_col, list_col="__c")

    thr = float(threshold)

    def _judge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = x / norms
        sims = x @ x.T
        m = len(pdf)
        keep = np.ones(m, dtype=bool)
        for i in range(1, m):
            # any earlier (lower-id) member this close? then i is a dup
            if (sims[i, :i] >= thr).any():
                keep[i] = False
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["__c"].astype("int64"),
                "keep": keep,
            }
        )

    # no output ordering: a global sort would add a corpus-sized range
    # exchange; consumers joining the keep column back don't need one
    return assigned.groupBy("__c").applyInPandas(_judge, schema=out_schema)
