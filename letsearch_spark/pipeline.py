"""End-to-end training-data preparation: the round-trip a pretraining
corpus actually takes, composed from this repo's operators.

The reference stops at search (collection_actor.rs:764-885); the
north-star scope (BASELINE.json) adds the LLM-data-pipeline operators.
This module is their composition -- ONE declarative recipe:

    0a. URL filter        (functions/text.py url_quality_flags,
        optional -- blocklist/trap/spam-host rejects on the URL alone,
        before any content stage reads a byte)
    0a2. URL dedup        (operators/dedup.py url_dedup, optional, r10
        -- one keeper per canonical URL, still before any content cost)
    0. HTML extraction    (functions/html.py html_to_text, optional --
       crawl pages in, visible text + link-density page drop out)
    0b. language ID       (operators/langid.py predict_lang, optional,
        r10 -- annotate or filter at the CCNet position)
    1. quality filter     (functions/text.py gopher_flags)
    1b. perplexity filter (operators/ngram_lm.py, CCNet-style, optional)
    1c. C4 cleaning       (functions/text.py c4_clean_lines + c4_flags,
        optional -- line rewrite then page filter, Raffel et al. 2020)
    1d. compression filter (functions/text.py compression_flags,
        optional -- zlib-ratio boilerplate/gibberish drop)
    2. line dedup         (operators/dedup.py remove_duplicate_lines)
    2c. decontamination   (ngram_containment_pairs vs an eval set,
        optional -- benchmark-leakage removal)
    3. fuzzy dedup        (minhash_lsh_pairs -> dedup_keep_list, or
                           dedup_keep_best via "keep_best_col")
    3b. DSIR selection    (operators/dsir.py, optional)
    3c. quality classifier (operators/classifier.py, GPT-3-style
        positive-vs-crawl logistic regression + Pareto keep, optional)
    3d. per-domain cap    (operators/sample.py stratified_topk_sample,
        optional -- at most k docs per domain, hash-deterministic)
    4. mixture resample   (operators/sample.py mixture_hash_sample)
    5. train/val/test     (operators/sample.py hash_split)
    6. sequence packing   (operators/pack.py: pack_sequences concat-
       split layout, or pack_documents_bins whole-document BFD bins
       via pack_layout='bins')

Every stage is the scale shape (banded joins, hash filters, single
shuffles) -- the composition inherits the operators' 100 TB designs and
adds nothing driver-side except the tiny mixture count aggregation. The
whole pipeline is lazy up to the fuzzy-dedup keep-list (connected
components must iterate); callers get back DataFrames plus an audit of
per-stage row counts.

Determinism: stages 1-2 are pure functions of the text; stages 4-5 are
hash-stable (append/rerun-safe); stage 3's canonical survivor is the
min-key per cluster; stage 6 is a pure function of (key -> tokens). A
rerun over the same corpus reproduces the output bit-for-bit --
the property that makes data ablations comparable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import os
import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# prepare_training_data result -> its persisted intermediates. Weak keys
# bound THIS registry; Spark's CacheManager still holds cached plans by
# strong reference until unpersist, so explicit release_training_data is
# the documented path -- a weakref.finalize on the result (registered at
# build time) backstops callers who drop it without releasing
_RELEASABLE: "weakref.WeakKeyDictionary[DataFrame, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

# Corpus size (rows) at which decontaminate method='auto' switches from
# the shingle-join path to the broadcast-Bloom path. SCALING.md's probe
# (fixed probe set, corpus grown x1/x4/x16 from the 5k-doc sf0.1 base)
# measured join cheaper through x4 (20k docs) and Bloom cheaper by x16
# (80k docs); the midpoint rounds to 40k. Local-mode shuffle understates
# the cluster-side gap (join shuffles EVERY corpus shingle), so past the
# midpoint Bloom is the safe choice.
DECON_AUTO_THRESHOLD_DOCS = 40_000


@dataclass
class PrepConfig:
    """Knobs for :func:`prepare_training_data`; defaults are the
    operators' own defaults, thresholds sized for chunk-scale text."""

    key_col: str = "doc_id"
    text_col: str = "text"
    domain_col: str | None = None

    # stage 1 -- quality (None disables; kwargs forwarded to gopher_flags)
    quality: dict | None = field(default_factory=dict)
    # stage 1b -- CCNet-style perplexity filter (None disables):
    # kwargs for operators/ngram_lm.py perplexity_filter, minus the
    # key/text columns -- e.g. {"lm": <trained model>, "max_ppl": 500.0}
    ppl_filter: dict | None = None
    # stage 1d -- deflate-compressibility filter (None disables, the
    # default): kwargs to functions/text.py compression_flags, e.g.
    # {"min_ratio": 0.25, "max_ratio": 1.05}. Drops templated
    # boilerplate (compresses too well) and non-linguistic payloads
    # (barely compress) by zlib ratio
    compression: dict | None = None
    # stage 1c -- C4 cleaning (None disables, the default): line-level
    # rewrite (terminal punctuation / min_line_words / no 'javascript')
    # then page-level flags (sentence floor, lorem ipsum, curly brace,
    # blocklist). {} enables the paper defaults; extra keys
    # (min_line_words, min_sentences, blocklist) forward to
    # stage 0 -- HTML extraction (None disables, the default): {} runs
    # plain html_to_text over text_col; optional "max_link_density"
    # drops link-dense pages (nav/footer farms) BEFORE extraction cost
    # is spent downstream. Rewrites text, so it shares token_count_col's
    # incompatibility (counts of raw HTML would corrupt packing).
    html: dict | None = None
    # stage 0a -- URL-level page filter (None disables, the default):
    # {"url_col": <column>, optional blocked_hosts / blocked_patterns /
    # max_path_depth / max_host_digit_ratio forwarded to
    # functions/text.py url_quality_flags}. The cheapest reject in the
    # recipe: a page drops on its URL alone, before any text stage
    # reads a byte of content (pairs with the WET source's target_uri)
    url_filter: dict | None = None
    # stage 0a2 -- URL-level exact dedup (r10; None disables, the
    # default): {"url_col": <column>}. The CCNet/C4 first pass: keep
    # ONE row (min key) per canonical URL (normalize_url -- tracking
    # params / host case / fragments / default ports / www. / trailing
    # slash all collapse); rows with null or hostless URLs are kept
    # unconditionally. Runs right after the URL filter, before any
    # content stage spends compute on recrawls of the same page.
    url_dedup: dict | None = None
    # stage 0b -- char-n-gram language ID (r10; None disables, the
    # default): {"model": <LangIdModel from fit_langid>, optional
    # "allowed": [langs to KEEP] (absent = annotate-only), "out_col":
    # prediction column (default 'pred_lang')}. Runs right after HTML
    # extraction, before any quality stage spends compute on
    # out-of-scope languages (the CCNet ordering). The model object
    # fingerprints by type, not content (the quality_classifier
    # caveat).
    langid: dict | None = None
    # functions/text.py c4_clean_lines / c4_flags. Rewrites text, so it
    # shares line_dedup's token_count_col incompatibility.
    c4: dict | None = None
    # stage 2 -- line dedup (None disables)
    line_dedup: dict | None = field(default_factory=dict)
    # stage 2b -- span-level exact substring dedup (None disables, the
    # default; kwargs to remove_duplicate_ngrams, e.g. {"width": 50}).
    # Rewrites text like line_dedup, so it shares the token_count_col
    # incompatibility.
    ngram_dedup: dict | None = None
    # stage 2c -- benchmark decontamination (None disables, the default):
    # {"probes": <eval-set DataFrame>, "probe_id": ..., "probe_text": ...}
    # -- extra keys (n/threshold/max_shingle_freq; fpp for the Bloom
    # path) forward to the chosen operator. Drops every corpus
    # document whose shingles COVER any probe at >= threshold
    # containment (asymmetric on purpose: a long training document
    # embedding a short benchmark item verbatim must score ~1.0).
    # "method": 'join' | 'bloom' | 'auto' (default) -- auto picks
    # Bloom once the corpus reaches "auto_threshold_docs" rows
    # (DECON_AUTO_THRESHOLD_DOCS), per SCALING.md's measured crossover;
    # both paths return identical hits, so auto never changes results.
    decontaminate: dict | None = None
    # stage 3 -- fuzzy dedup (None disables; kwargs to minhash_lsh_pairs).
    # Optional "keep_best_col": <column name> switches the survivor rule
    # from min-id (dedup_keep_list) to highest-score-per-cluster
    # (dedup_keep_best) -- e.g. a length or classifier-score column,
    # the FineWeb/RefinedWeb keep rule
    fuzzy_dedup: dict | None = field(default_factory=lambda: {"threshold": 0.8})
    # stage 3a2 -- semantic dedup over an embedding column (None
    # disables, the default): {"vec_col": <array column, default
    # 'embedding'>, optional threshold / nlist / pca / seed forwarded
    # to operators/dedup.py semantic_dedup}. "pca": k (r9) projects to
    # k dims first -- 4x fewer bytes on the cluster exchange at 64->16,
    # keep-list recall vs full-dim measured in SCALING.md r9. Requires
    # the input frame to carry the embedding column (embed upstream).
    semantic_dedup: dict | None = None
    # stage 3b -- DSIR target-domain selection (None disables):
    # {"target": <target-corpus DataFrame>, "k": <docs to keep>, ...}
    # extra keys forward to operators/dsir.py dsir_sample
    dsir: dict | None = None
    # stage 3c -- model-based quality filter (None disables): {"model":
    # <QualityClassifier from fit_quality_classifier>, ...} -- extra
    # keys (mode/threshold/pareto_alpha/seed) forward to
    # operators/classifier.py quality_classifier_filter
    quality_classifier: dict | None = None
    # stage 3d -- hard per-domain cap (None disables): {"k": N,
    # optional "strata_col" (default domain_col), "seed"} -- at most k
    # docs per domain, chosen by key hash (stratified_topk_sample's
    # WindowGroupLimit shape); the RefinedWeb anti-head-domination rule
    domain_cap: dict | None = None
    # stage 4 -- mixture (None disables; needs domain_col)
    mixture_weights: dict[str, float] | None = None
    mixture_target_rows: int = 0
    # stage 4b -- fill-in-the-middle objective transform (r9; None
    # disables, the default): kwargs for functions/text.py
    # fim_transform (seed / rate / mode / sentinels). Applied AFTER
    # selection+mixture and BEFORE split/count/pack, so the packed
    # layout counts the rewritten text. Rewrites documents, so it
    # shares the token_count_col incompatibility. (T5 span corruption
    # stays an egress-side operator -- its (input, target) PAIR output
    # doesn't fit the single-text packing stream.)
    fim: dict | None = None
    # stage 5 -- split
    split_weights: dict[str, float] | None = None
    # stage 6 -- packing
    seq_len: int = 2048
    num_shards: int = 32
    # None: concatenate each shard's documents in key order; an int:
    # deterministic pseudo-random order (adjacent-document
    # decorrelation for pretraining; distinct seeds -> distinct epoch
    # permutations at zero extra cost)
    pack_shuffle_seed: int | None = None
    # resumable checkpointing (None disables, the default): a directory
    # where every enabled stage materializes its output parquet plus a
    # marker carrying a CHAINED fingerprint (md5 over input row count,
    # stage order, and each stage's config fragment). A rerun with the
    # same workdir loads each stage whose fingerprint still matches
    # instead of recomputing it -- so a crash at hour 20 of a 100 TB
    # recipe resumes after the last completed stage, and editing, say,
    # the dsir config recomputes dsir and later stages while every
    # earlier stage loads from parquet. Stage determinism (module
    # docstring) is what makes the loaded outputs equal recomputed
    # ones. CAVEAT: DataFrame/model-valued knobs (decontaminate.probes,
    # dsir.target, quality_classifier model) fingerprint by schema, not
    # content -- changing their CONTENT without changing any config
    # requires a fresh workdir.
    workdir: str | None = None
    # 'split': concat-then-split pretraining layout (pack_sequences);
    # 'bins': whole-document best-fit bins, the SFT layout
    # (pack_documents_bins; oversize docs land alone in their own
    # sequence -- the pipeline never silently drops a survivor).
    # pack_shuffle_seed only applies to 'split' (bins have no stream
    # order), so combining it with 'bins' raises.
    pack_layout: str = "split"
    # pre-supplied token counts (e.g. a real tokenizer's) -- only valid
    # when line_dedup is None: stripping lines invalidates counts taken
    # on the original text, so that combination raises
    token_count_col: str | None = None  # None: ceil(words * 1.3)
    # persist the surviving corpus after the expensive text-rewriting /
    # dedup stages (MEMORY_AND_DISK): every later stage's audit count
    # and both returned frames re-read it, so without this each count
    # re-executes the whole upstream lineage (measured ~5x the
    # sum-of-stages cost at sf0.1). The final persisted frame backs the
    # returned clean/layout; release_training_data() frees it.
    persist_intermediates: bool = True


def prepare_training_data(
    docs: DataFrame,
    config: PrepConfig | None = None,
    stage_seconds: dict[str, float] | None = None,
) -> tuple[DataFrame, DataFrame, dict[str, int]]:
    """Run the filter -> dedup -> mix -> split -> pack recipe.

    Returns ``(clean_docs, layout, audit)``:

    * ``clean_docs`` -- surviving documents with their (possibly
      line-stripped) text, ``split`` label, and token count;
    * ``layout`` -- the packed-sequence spans of the TRAIN split
      (shard, seq, key, tok_begin, tok_len, seq_offset);
    * ``audit`` -- rows surviving each enabled stage (the numbers a
      data card reports).

    The audit forces one count per enabled stage; pass a cached input
    if the scan is expensive. With ``persist_intermediates`` (default)
    the rewrite/dedup stage outputs persist MEMORY_AND_DISK while the
    recipe runs -- otherwise every later count re-executes the whole
    upstream lineage (measured ~5x the sum-of-stages cost) -- and the
    final stage's persist keeps backing the returned frames; call
    :func:`release_training_data` on ``clean_docs`` when done with
    them.
    """
    from letsearch_spark.functions.text import gopher_flags, token_count_approx
    from letsearch_spark.operators.dedup import (
        dedup_keep_list,
        minhash_lsh_pairs,
        remove_duplicate_lines,
    )
    from letsearch_spark.operators.pack import (
        pack_documents_bins,
        pack_sequences,
    )
    from letsearch_spark.operators.sample import hash_split, mixture_hash_sample

    import time as _time

    _t0 = [_time.time()]

    def _lap(name: str) -> None:
        # per-stage wall seconds (stage start -> audited count), filled
        # into the caller's ``stage_seconds`` dict so a bench/regression
        # harness can attribute a slowdown to ONE stage instead of the
        # end-to-end number
        now = _time.time()
        if stage_seconds is not None:
            stage_seconds[name] = round(now - _t0[0], 3)
        _t0[0] = now

    cfg = config or PrepConfig()
    if cfg.token_count_col is not None and (
        cfg.line_dedup is not None
        or cfg.ngram_dedup is not None
        or cfg.c4 is not None
        or cfg.html is not None
        or cfg.fim is not None
    ):
        raise ValueError(
            "token_count_col carries counts of the ORIGINAL text; the "
            "html/c4/line-dedup/ngram-dedup/fim stages rewrite "
            "documents, which would silently corrupt the packed "
            "layout. Disable them to trust the counts, or "
            "token_count_col=None to recount the cleaned text."
        )
    if cfg.pack_layout not in ("split", "bins"):
        raise ValueError(
            f"pack_layout must be 'split' or 'bins', got {cfg.pack_layout!r}"
        )
    if cfg.pack_layout == "bins" and cfg.pack_shuffle_seed is not None:
        raise ValueError(
            "pack_shuffle_seed applies only to pack_layout='split' "
            "(bins have no stream order)"
        )
    key, text = cfg.key_col, cfg.text_col
    audit: dict[str, int] = {"input": docs.count()}
    _lap("input")
    cur = docs

    # staged persistence (persist_intermediates): the rewrite/dedup
    # stages are re-read by every later audit count AND the returned
    # frames; persist each, and drop the superseded one once the next
    # stage's count has materialized its successor
    persisted: list[DataFrame] = []

    def _persist_stage(df: DataFrame) -> DataFrame:
        # with a workdir the stage parquet IS the persistence; an extra
        # MEMORY_AND_DISK copy would only double the footprint
        if cfg.workdir is not None or not cfg.persist_intermediates:
            return df
        from pyspark import StorageLevel

        persisted.append(df.persist(StorageLevel.MEMORY_AND_DISK))
        return persisted[-1]

    def _drop_superseded() -> None:
        while len(persisted) > 1:
            persisted.pop(0).unpersist()

    # ---- resumable stage checkpointing (cfg.workdir) ----
    # Make-style chained fingerprints: fp_i = md5(fp_{i-1} + name +
    # json(stage config fragment)); fp_0 covers the input row count.
    # A marker whose fp matches means this stage AND every stage before
    # it ran with identical configuration over the same-size input, so
    # its parquet can substitute for recomputation (stages are
    # deterministic -- module docstring). Changing stage k's config
    # shifts fp_k..fp_n, so k and everything after recompute while
    # 1..k-1 still load.
    import hashlib
    import json as _json

    # fp_0 covers row count + key/text column NAMES + (workdir only) a
    # content signature over the keys and a 128-byte text prefix crc --
    # so a same-row-count but content-changed corpus, or the same corpus
    # re-run with renamed key/text columns, cannot silently load stale
    # stage parquet. The signature is one column-pruned agg (keys +
    # text prefixes), paid only when checkpoints are in play. Residual
    # hazard: edits past byte 128 of a document with an unchanged key
    # set still collide; the workdir is a cache keyed by THIS
    # fingerprint, wipe it when in doubt.
    _fp0: dict = {
        "rows": audit["input"],
        "key_col": key,
        "text_col": text,
    }
    if cfg.workdir is not None:
        _sig = docs.agg(
            F.sum(F.crc32(F.col(key).cast("string"))).alias("ksum"),
            F.min(F.col(key).cast("string")).alias("kmin"),
            F.max(F.col(key).cast("string")).alias("kmax"),
            F.sum(
                F.crc32(F.substring(F.col(text).cast("string"), 1, 128))
            ).alias("tsum"),
        ).first()
        _fp0["content_sig"] = [
            _sig["ksum"], _sig["kmin"], _sig["kmax"], _sig["tsum"],
        ]
    _chain_fp = [
        hashlib.md5(
            _json.dumps(_fp0, default=str, sort_keys=True).encode()
        ).hexdigest()
    ]
    resumed: list[str] = []

    def _fp_value(o):
        if isinstance(o, DataFrame):
            return f"df:{o.schema.simpleString()}"
        if isinstance(o, (dict, list, tuple, str, int, float, bool)) or o is None:
            return o
        return f"{type(o).__name__}"

    def _advance_fp(name: str, fragment) -> None:
        frag = _json.dumps(fragment, default=_fp_value, sort_keys=True)
        _chain_fp[0] = hashlib.md5(
            (_chain_fp[0] + name + frag).encode()
        ).hexdigest()

    def _stage_paths(name: str) -> tuple[str, str]:
        d = os.path.join(cfg.workdir, f"stage_{name}")
        return d, os.path.join(cfg.workdir, f"stage_{name}.json")

    # markers go through the Hadoop FS (temp-then-rename, crash-safe),
    # so a cluster can point workdir at HDFS/S3, not just local disk
    from letsearch_spark.streaming.incremental import (
        _marker_read,
        _marker_write,
    )

    _spark = docs.sparkSession

    def _stage_load(name: str, fragment) -> DataFrame | None:
        """None = must (re)compute; a DataFrame = valid checkpoint."""
        if cfg.workdir is None:
            return None
        _advance_fp(name, fragment)
        data_dir, meta_path = _stage_paths(name)
        raw = _marker_read(_spark, meta_path)
        if raw is None:
            return None
        try:
            meta = _json.loads(raw)
        except ValueError:
            return None
        if meta.get("fp") != _chain_fp[0]:
            return None
        df = _spark.read.parquet(data_dir)
        audit[name] = int(meta["count"])
        for k, v in (meta.get("audit_extra") or {}).items():
            audit[k] = v
        resumed.append(name)
        _lap(name)
        return df

    def _stage_store(
        name: str, df: DataFrame, audit_extra: dict | None = None
    ) -> DataFrame:
        """Finish a computed stage: audit count + lap, and with a
        workdir also materialize + write the marker LAST (a crash
        between the two leaves an ignorable orphan parquet the next
        run overwrites)."""
        if cfg.workdir is None:
            audit[name] = df.count()
            _lap(name)
            return df
        data_dir, meta_path = _stage_paths(name)
        df.write.mode("overwrite").parquet(data_dir)
        out = _spark.read.parquet(data_dir)
        audit[name] = out.count()
        _marker_write(
            _spark,
            meta_path,
            _json.dumps(
                {
                    "fp": _chain_fp[0],
                    "count": audit[name],
                    "audit_extra": audit_extra or {},
                }
            ),
        )
        _lap(name)
        return out

    if cfg.url_filter is not None:
        _loaded = _stage_load("url_filter", cfg.url_filter)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.functions.text import url_quality_flags

            u_cfg = dict(cfg.url_filter)
            url_col = u_cfg.pop("url_col", None)
            if url_col is None:
                raise ValueError(
                    "url_filter needs 'url_col' naming the URL column "
                    "(e.g. the WET source's target_uri)"
                )
            cur = _stage_store(
                "url_filter",
                cur.where(
                    url_quality_flags(F.col(url_col), **u_cfg)["passes"]
                ),
            )

    if cfg.url_dedup is not None:
        _loaded = _stage_load("url_dedup", cfg.url_dedup)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.functions.text import url_host
            from letsearch_spark.operators.dedup import url_dedup

            ud_cfg = dict(cfg.url_dedup)
            ud_url = ud_cfg.pop("url_col", None)
            if ud_cfg:
                raise ValueError(
                    f"unknown url_dedup options: {sorted(ud_cfg)} "
                    "(supported: url_col)"
                )
            if ud_url is None:
                raise ValueError(
                    "url_dedup needs 'url_col' naming the URL column"
                )
            # the keep list is distinct-URL-sized (can be corpus-scale)
            # -- a plain key semi-join, never a broadcast; hostless
            # rows union back in unconditionally
            keeps = url_dedup(cur, key, ud_url).select(
                F.col("keep_id").alias(key)
            )
            u = F.coalesce(F.col(ud_url), F.lit(""))
            hostless = cur.where(F.length(url_host(u)) == 0)
            cur = _stage_store(
                "url_dedup",
                cur.join(keeps, key, "left_semi").unionByName(hostless),
            )

    if cfg.html is not None:
        _loaded = _stage_load("html", cfg.html)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.functions.html import (
                html_link_density,
                html_to_text,
            )

            html_cfg = dict(cfg.html)
            max_ld = html_cfg.pop("max_link_density", None)
            if html_cfg:
                raise ValueError(
                    f"unknown html options: {sorted(html_cfg)} "
                    "(supported: max_link_density)"
                )
            if max_ld is not None:
                ld = html_link_density(F.col(text))
                # empty pages have NULL density; they drop on the length
                # guard below, not here
                cur = cur.where(ld.isNull() | (ld <= float(max_ld)))
            cur = cur.withColumn(text, html_to_text(F.col(text)))
            cur = _persist_stage(cur.where(F.length(F.col(text)) > 0))
            cur = _stage_store("html", cur)
            _drop_superseded()

    if cfg.langid is not None:
        _loaded = _stage_load("langid", cfg.langid)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.langid import predict_lang

            l_cfg = dict(cfg.langid)
            model = l_cfg.pop("model", None)
            allowed = l_cfg.pop("allowed", None)
            out_col = l_cfg.pop("out_col", "pred_lang")
            if l_cfg:
                raise ValueError(
                    f"unknown langid options: {sorted(l_cfg)} "
                    "(supported: model, allowed, out_col)"
                )
            if model is None:
                raise ValueError(
                    "langid needs 'model' (a LangIdModel from fit_langid)"
                )
            preds = predict_lang(
                cur, model, id_col=key, text_col=text, out_col=out_col
            ).select(key, out_col)
            # annotate every surviving row; filter only when 'allowed'
            # is given (the predict join is 1:1 on the key, so this
            # stage never multiplies or silently drops rows)
            cur = cur.join(preds, key)
            if allowed is not None:
                cur = cur.where(F.col(out_col).isin(list(allowed)))
            cur = _stage_store("langid", cur)

    if cfg.quality is not None:
        _loaded = _stage_load("quality_filter", cfg.quality)
        if _loaded is not None:
            cur = _loaded
        else:
            flags = gopher_flags(F.col(text), **cfg.quality)
            cur = _stage_store("quality_filter", cur.where(flags["passes"]))

    if cfg.compression is not None:
        _loaded = _stage_load("compression", cfg.compression)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.functions.text import compression_flags

            cur = _stage_store(
                "compression",
                cur.where(
                    compression_flags(F.col(text), **cfg.compression)["passes"]
                ),
            )

    if cfg.c4 is not None:
        _loaded = _stage_load("c4", cfg.c4)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.functions.text import c4_clean_lines, c4_flags

            c4_cfg = dict(cfg.c4)
            min_line_words = c4_cfg.pop("min_line_words", 5)
            if "blocklist" in c4_cfg:
                c4_cfg["blocklist"] = tuple(c4_cfg["blocklist"])
            # C4's order: rewrite lines first, then judge the cleaned page
            cur = cur.withColumn(text, c4_clean_lines(F.col(text), min_line_words))
            cur = _persist_stage(cur.where(c4_flags(F.col(text), **c4_cfg)["passes"]))
            cur = _stage_store("c4", cur)
            _drop_superseded()

    if cfg.ppl_filter is not None:
        _loaded = _stage_load("ppl_filter", cfg.ppl_filter)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.ngram_lm import perplexity_filter

            cur = _stage_store(
                "ppl_filter",
                perplexity_filter(
                    cur, key_col=key, text_col=text, **cfg.ppl_filter
                ),
            )

    if cfg.line_dedup is not None:
        _loaded = _stage_load("line_dedup", cfg.line_dedup)
        if _loaded is not None:
            cur = _loaded
        else:
            keep_cols = [c for c in cur.columns if c not in (text,)]
            cleaned = remove_duplicate_lines(cur, key, text, **cfg.line_dedup)
            cur = cur.select(*keep_cols).join(
                cleaned.select(key, text), key
            )
            # stripping boilerplate can empty a document
            cur = _persist_stage(cur.where(F.length(F.trim(F.col(text))) > 0))
            cur = _stage_store("line_dedup", cur)
            _drop_superseded()

    if cfg.ngram_dedup is not None:
        _loaded = _stage_load("ngram_dedup", cfg.ngram_dedup)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.dedup import remove_duplicate_ngrams

            keep_cols = [c for c in cur.columns if c not in (text,)]
            cleaned = remove_duplicate_ngrams(cur, key, text, **cfg.ngram_dedup)
            cur = cur.select(*keep_cols).join(cleaned.select(key, text), key)
            cur = _persist_stage(cur.where(F.length(F.trim(F.col(text))) > 0))
            cur = _stage_store("ngram_dedup", cur)
            _drop_superseded()

    if cfg.decontaminate is not None and (
        _loaded := _stage_load("decontaminate", cfg.decontaminate)
    ) is not None:
        cur = _loaded
    elif cfg.decontaminate is not None:
        # method='bloom' swaps in the broadcast-Bloom pre-filter
        # (operators/bloom.py) -- bit-identical hits with no corpus-side
        # shuffle. method='auto' (the default) picks per run from the
        # corpus size against the measured crossover: SCALING.md's
        # decon_join/decon_bloom probe shows join cheaper at x1-x4 of
        # the 5k-doc bench corpus (Bloom pays a fixed probe-side
        # construction cost) and Bloom cheaper by x16, with the
        # crossover between 20k and 80k docs -- and the join path's
        # full-corpus shingle shuffle is the term that explodes on a
        # network-bound cluster, so auto errs toward Bloom past the
        # midpoint. Mirrors serving's resolve_strategy
        # (collection.py:898): size-driven, overridable, loud in the
        # audit.
        method = cfg.decontaminate.get("method", "auto")
        if method == "auto":
            threshold = int(
                cfg.decontaminate.get(
                    "auto_threshold_docs", DECON_AUTO_THRESHOLD_DOCS
                )
            )
            # cur is the previous stage's persisted frame; the count is
            # a cached-scan aggregate, not a recompute
            method = "bloom" if cur.count() >= threshold else "join"
            audit["decontaminate_method"] = method
        if method == "bloom":
            from letsearch_spark.operators.bloom import (
                decontaminate_with_bloom as _decon,
            )
        elif method == "join":
            from letsearch_spark.operators.dedup import (
                ngram_containment_pairs as _decon,
            )
        else:
            raise ValueError(
                f"decontaminate method must be 'join' or 'bloom', got {method!r}"
            )

        import inspect

        # drop path-specific knobs the chosen function doesn't take
        # (e.g. fpp set for the Bloom path while auto resolved to join)
        valid = set(inspect.signature(_decon).parameters)
        extra = {
            k: v
            for k, v in cfg.decontaminate.items()
            if k
            not in ("probes", "probe_id", "probe_text", "method", "auto_threshold_docs")
            and k in valid
        }
        hits = _decon(
            cur,
            cfg.decontaminate["probes"],
            corpus_id=key,
            corpus_text=text,
            probe_id=cfg.decontaminate["probe_id"],
            probe_text=cfg.decontaminate["probe_text"],
            **extra,
        )
        contaminated = hits.select(F.col("corpus_id").alias(key)).distinct()
        # persist like the other dedup stages: the containment anti-join
        # is expensive, and without pinning it here the fuzzy-dedup stage
        # and every later audit count would re-execute it from the last
        # persisted frame
        cur = _persist_stage(cur.join(contaminated, key, "left_anti"))
        cur = _stage_store(
            "decontaminate",
            cur,
            audit_extra=(
                {"decontaminate_method": audit["decontaminate_method"]}
                if "decontaminate_method" in audit
                else None
            ),
        )
        _drop_superseded()

    if cfg.fuzzy_dedup is not None:
        _loaded = _stage_load("fuzzy_dedup", cfg.fuzzy_dedup)
        if _loaded is not None:
            cur = _loaded
        else:
            fuzzy_cfg = dict(cfg.fuzzy_dedup)
            keep_best_col = fuzzy_cfg.pop("keep_best_col", None)
            pairs = minhash_lsh_pairs(cur, key, text, **fuzzy_cfg)
            if keep_best_col is not None:
                from letsearch_spark.operators.dedup import dedup_keep_best

                keep = dedup_keep_best(cur, pairs, key, keep_best_col)
            else:
                keep = dedup_keep_list(cur, pairs, key)
            cur = _persist_stage(
                cur.join(
                    keep.where("is_kept").select(F.col("id").alias(key)), key
                )
            )
            cur = _stage_store("fuzzy_dedup", cur)
            _drop_superseded()

    if cfg.semantic_dedup is not None:
        _loaded = _stage_load("semantic_dedup", cfg.semantic_dedup)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.dedup import (
                semantic_dedup as _semantic_dedup,
            )

            sd_cfg = dict(cfg.semantic_dedup)
            vcol = sd_cfg.pop("vec_col", "embedding")
            if vcol not in cur.columns:
                raise ValueError(
                    f"semantic_dedup stage needs column {vcol!r} on the "
                    "input frame (embed upstream or set vec_col)"
                )
            verdicts = _semantic_dedup(cur, id_col=key, vec_col=vcol, **sd_cfg)
            # anti-join on the DROPPED ids (r9 review catch): a doc
            # with a NULL embedding gets no verdict row -- like every
            # other dedup stage, no verdict means keep, never delete
            cur = _persist_stage(
                cur.join(
                    verdicts.where(~F.col("keep")).select(key),
                    key,
                    "left_anti",
                )
            )
            cur = _stage_store("semantic_dedup", cur)
            _drop_superseded()

    if cfg.dsir is not None:
        _loaded = _stage_load("dsir", cfg.dsir)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.dsir import dsir_sample

            extra = {
                k: v for k, v in cfg.dsir.items() if k not in ("target", "k")
            }
            picked = dsir_sample(
                cur,
                cfg.dsir["target"],
                k=cfg.dsir["k"],
                id_col=key,
                text_col=text,
                **extra,
            )
            cur = _stage_store(
                "dsir", cur.join(picked.select(key), key, "left_semi")
            )

    if cfg.quality_classifier is not None:
        _loaded = _stage_load("quality_classifier", cfg.quality_classifier)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.classifier import (
                quality_classifier_filter,
            )

            extra = {
                k: v for k, v in cfg.quality_classifier.items() if k != "model"
            }
            cur = _stage_store(
                "quality_classifier",
                quality_classifier_filter(
                    cur,
                    cfg.quality_classifier["model"],
                    id_col=key,
                    text_col=text,
                    **extra,
                ),
            )

    if cfg.domain_cap is not None:
        strata = cfg.domain_cap.get("strata_col") or cfg.domain_col
        if strata is None:
            raise ValueError("domain_cap needs strata_col or domain_col")
        _loaded = _stage_load("domain_cap", [cfg.domain_cap, strata])
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.operators.sample import (
                stratified_topk_sample,
            )

            cur = _stage_store(
                "domain_cap",
                stratified_topk_sample(
                    cur,
                    key,
                    strata,
                    k=cfg.domain_cap["k"],
                    seed=cfg.domain_cap.get("seed", 42),
                ),
            )

    if cfg.mixture_weights is not None:
        if cfg.domain_col is None:
            raise ValueError("mixture_weights needs domain_col")
        _loaded = _stage_load(
            "mixture",
            [cfg.mixture_weights, cfg.mixture_target_rows, cfg.domain_col],
        )
        if _loaded is not None:
            cur = _loaded
        else:
            cur = _stage_store(
                "mixture",
                mixture_hash_sample(
                    cur,
                    key,
                    cfg.domain_col,
                    cfg.mixture_weights,
                    cfg.mixture_target_rows,
                ),
            )

    if cfg.fim is not None:
        _loaded = _stage_load("fim", cfg.fim)
        if _loaded is not None:
            cur = _loaded
        else:
            from letsearch_spark.functions.text import fim_transform

            fimmed = fim_transform(F.col(key), F.col(text), **cfg.fim)
            cur = _stage_store(
                "fim",
                cur.withColumn(text, fimmed["text"]).withColumn(
                    "fim_applied", fimmed["applied"]
                ),
            )

    cur = hash_split(cur, key, weights=cfg.split_weights)

    if cfg.token_count_col is None:
        cur = cur.withColumn("tokens", token_count_approx(F.col(text)))
    else:
        cur = cur.withColumn("tokens", F.col(cfg.token_count_col).cast("long"))

    if cfg.pack_layout == "split":
        layout = pack_sequences(
            cur.where(F.col("split") == "train"),
            key,
            "tokens",
            seq_len=cfg.seq_len,
            num_shards=cfg.num_shards,
            shuffle_seed=cfg.pack_shuffle_seed,
        )
    else:  # 'bins' -- validated on entry
        layout = pack_documents_bins(
            cur.where(F.col("split") == "train"),
            key,
            "tokens",
            seq_len=cfg.seq_len,
            num_shards=cfg.num_shards,
            on_oversize="own_seq",
        )
    audit["train_docs"] = cur.where(F.col("split") == "train").count()
    _lap("split_pack")
    if cfg.workdir is not None:
        # which stages loaded from the workdir instead of recomputing
        # (a list, not a count -- the audit is the data-card record)
        audit["resumed"] = list(resumed)
    if persisted:
        _RELEASABLE[cur] = list(persisted)
        # safety net: if the caller drops the result without calling
        # release_training_data, unpersist on GC of the result frame
        # (the CacheManager would otherwise pin the blocks for the
        # whole session). Explicit release stays the documented path.
        weakref.finalize(cur, _unpersist_quietly, list(persisted))
    return cur, layout, audit


def _unpersist_quietly(frames: list[DataFrame]) -> None:
    for p in frames:
        try:
            p.unpersist()
        except Exception:
            pass


def release_training_data(clean_docs: DataFrame) -> None:
    """Unpersist the intermediates backing a prepare_training_data
    result (no-op if none were persisted or already released). Call
    after the clean/layout frames have been written out."""
    _unpersist_quietly(_RELEASABLE.pop(clean_docs, []))


def corpus_report(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str | None = None,
) -> DataFrame:
    """One-pass corpus data card: the per-domain and corpus-total stats
    a dataset release documents (doc/char/word/approx-token counts,
    mean and max document length).

    Shape: a single scan feeding one ROLLUP aggregation -- per-domain
    rows plus a grand-total row in the same shuffle (no second pass
    over the text). With ``domain_col=None`` only the total row is
    produced. At 100 TB this is exactly one map-side-combined
    aggregation over however many domains exist (tiny result), so it is
    safe to run after every pipeline stage for audit trails.

    Columns: (domain, is_total, n_docs, n_empty, total_chars,
    total_words, total_tokens, avg_words, max_chars). The grand-total
    row is marked by ``is_total`` (from GROUPING(), not a sentinel
    domain value -- a real domain named 'ALL' stays unambiguous); its
    ``domain`` is null, and a null source domain is reported as its own
    null-domain row. Null-or-blank text counts as a document with zero
    chars/words/tokens (and into ``n_empty``), so
    avg_words == total_words / n_docs always holds; avg_words is
    rounded to 6 for cross-engine stability.
    """
    from letsearch_spark.functions.text import word_count

    text = F.col(text_col)
    blank = F.length(F.trim(F.coalesce(text, F.lit("")))) == 0
    base = docs.select(
        (
            F.col(domain_col) if domain_col is not None else F.lit(None)
        ).alias("__domain"),
        blank.cast("long").alias("__empty"),
        F.coalesce(F.length(text), F.lit(0)).cast("long").alias("__chars"),
        F.when(blank, F.lit(0))
        .otherwise(word_count(text))
        .cast("long")
        .alias("__words"),
    ).withColumn(
        # token_count_approx == ceil(words * 1.3); derive from __words so
        # the word split evaluates once per row
        "__tokens",
        F.ceil(F.col("__words") * 1.3).cast("long"),
    )
    if domain_col is not None:
        grouped = base.rollup("__domain")
        is_total = (F.grouping("__domain") == 1).alias("is_total")
    else:
        grouped = base.groupBy()
        is_total = F.lit(True).alias("is_total")
    agg = grouped.agg(
        is_total,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__empty").alias("n_empty"),
        F.sum("__chars").alias("total_chars"),
        F.sum("__words").alias("total_words"),
        F.sum("__tokens").alias("total_tokens"),
        F.round(F.avg("__words"), 6).alias("avg_words"),
        F.max("__chars").alias("max_chars"),
    )
    domain = (
        F.col("__domain") if domain_col is not None else F.lit(None).cast("string")
    )
    return agg.select(
        domain.alias("domain"),
        "is_total",
        "n_docs",
        "n_empty",
        "total_chars",
        "total_words",
        "total_tokens",
        "avg_words",
        "max_chars",
    ).orderBy(F.asc("is_total"), F.asc_nulls_last("domain"))


def write_training_shards(
    clean_docs: DataFrame,
    layout: DataFrame,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Materialize the packed layout as on-disk training shards.

    Joins the spans back to their document text and writes parquet
    partitioned by ``shard``, each row one (seq, seq_offset)-addressed
    span carrying its text -- the layout a tokenizing trainer consumes
    shard-by-shard (each shard is one independent, ordered token
    stream; a reader tokenizes the text and slices [tok_begin,
    tok_begin+tok_len)). Rows are written sorted by (seq, seq_offset)
    within each shard so readers stream sequences in order without a
    sort.

    The join broadcasts nothing and shuffles each side once on the key;
    at 100 TB this is the final co-partitioned pass of the prep
    pipeline. Returns the span count actually written (counted from the
    written files -- one cheap scan, instead of re-executing the whole
    prep lineage; the inner join drops spans whose key is missing from
    ``clean_docs``, so this can be less than layout's row count).
    """
    spans = layout.join(
        clean_docs.select(F.col(key_col), F.col(text_col)), key_col
    )
    (
        spans.repartition(F.col("shard"))
        .sortWithinPartitions("seq", "seq_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return clean_docs.sparkSession.read.parquet(path).count()


def write_token_shards(
    clean_docs: DataFrame,
    layout: DataFrame,
    path: str,
    model,
    key_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = -1,
) -> int:
    """Materialize the packed layout as TOKEN-ID shards -- the terminal
    egress of a pretraining pipeline: parquet partitioned by ``shard``,
    each row one (seq, seq_offset)-addressed span carrying its slice of
    the document's BPE token ids (``token_ids array<int>``), rows
    sorted by (seq, seq_offset) within each shard so a trainer streams
    each sequence's ids in order with zero further processing.

    REQUIRES the layout's token counts to be BPE-exact under the SAME
    ``model`` (tokenizer.token_count_exact fed through PrepConfig's
    ``token_count_col``, with the text-rewriting stages disabled): a
    span addresses [tok_begin, tok_begin + tok_len) of the document's
    token stream, which only exists if count == len(encode(text)). The
    plan guards this per document in BOTH directions (an over-count
    would slice past the stream; an under-count would silently drop
    trailing tokens) and raises mid-job on the first document whose
    re-tokenization disagrees with its layout count.

    Shape at 100 TB: each surviving document is re-tokenized ONCE
    (Arrow-batched, word-memoized -- the same kernel the counting pass
    used), the span join co-shuffles on the key, and the shard write is
    the same single repartition as :func:`write_training_shards`.
    Returns the span count written.
    """
    from pyspark.sql import Window

    from letsearch_spark.tokenizer import BpeModel
    from letsearch_spark.tokenizer_bytebpe import ByteBpeModel
    from letsearch_spark.tokenizer_unigram import UnigramModel
    from letsearch_spark.tokenizer_wordpiece import WordPieceModel

    sel = clean_docs.select(F.col(key_col), F.col(text_col))
    if isinstance(model, ByteBpeModel):
        # r9: the byte-level family -- same contract, no unk possible
        # (total byte alphabet), layout counts must come from
        # token_count_exact_bytebpe under the same model
        from letsearch_spark.tokenizer_bytebpe import encode_ids_column

        ids = encode_ids_column(sel, text_col, model, out_col="__ids")
    elif isinstance(model, UnigramModel):
        # r9 review catch: a UnigramModel fell into the word-BPE branch
        # and crashed on .merges -- route to its own id encoder (layout
        # counts must come from token_count_exact_unigram)
        from letsearch_spark.tokenizer_unigram import (
            encode_ids_column_unigram,
        )

        ids = encode_ids_column_unigram(
            sel, text_col, model, out_col="__ids", unk_id=unk_id
        )
    elif isinstance(model, WordPieceModel):
        # r10: greedy longest-match family -- [UNK] is a real vocab id,
        # so unk_id does not apply; layout counts must come from
        # token_count_exact_wordpiece under the same model
        from letsearch_spark.tokenizer_wordpiece import (
            encode_ids_column_wordpiece,
        )

        ids = encode_ids_column_wordpiece(sel, text_col, model, out_col="__ids")
    elif isinstance(model, BpeModel):
        from letsearch_spark.tokenizer import encode_ids_column

        ids = encode_ids_column(
            sel, text_col, model, out_col="__ids", unk_id=unk_id
        )
    else:
        raise TypeError(
            "write_token_shards needs a BpeModel, UnigramModel, "
            f"ByteBpeModel or WordPieceModel, got {type(model).__name__}"
        )
    spans = layout.join(ids.select(key_col, "__ids"), key_col)
    # the layout's spans tile [0, count) exactly (pack_sequences
    # invariant), so the document's layout count is the max span end --
    # compare it with the re-tokenized length in BOTH directions: an
    # over-count would slice past the stream, an UNDER-count would
    # silently drop the document's trailing tokens. The window reuses
    # the join's key partitioning (no extra shuffle).
    layout_count = F.max(F.col("tok_begin") + F.col("tok_len")).over(
        Window.partitionBy(key_col)
    )
    span_ids = F.when(
        layout_count == F.size("__ids"),
        F.slice(F.col("__ids"), F.col("tok_begin") + F.lit(1), F.col("tok_len")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "write_token_shards: layout token count disagrees "
                    "with the re-tokenized stream for key "
                ),
                F.col(key_col).cast("string"),
                F.lit(
                    " -- the layout's token counts were not produced by "
                    "token_count_exact with this model (or the text was "
                    "rewritten after counting)"
                ),
            )
        )
    )
    out_cols = [c for c in layout.columns] + ["token_ids"]
    (
        spans.withColumn("token_ids", span_ids)
        .select(*out_cols)
        .repartition(F.col("shard"))
        .sortWithinPartitions("seq", "seq_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return clean_docs.sparkSession.read.parquet(path).count()
