"""End-to-end training-data preparation (letsearch_spark/pipeline.py):
the operator composition must survive a real corpus, keep its stage
accounting honest, and reproduce bit-for-bit on rerun."""

import os

import pytest
from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_prepare_training_data_end_to_end(spark, sf_dir):
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    cfg = PrepConfig(
        domain_col="lang",
        quality={"min_words": 25},
        fuzzy_dedup={"threshold": 0.8},
        seq_len=256,
        num_shards=4,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)

    # stage accounting: monotone non-increasing through the filters
    assert (
        audit["input"]
        >= audit["quality_filter"]
        >= audit["line_dedup"]
        >= audit["fuzzy_dedup"]
        > 0
    )
    # the planted near-dup pairs (TESTDATA.md: jaccard >= 0.8) must cost
    # rows in the fuzzy stage
    assert audit["fuzzy_dedup"] < audit["line_dedup"]

    rows = clean.collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["tokens"] > 0 for r in rows)

    # packing covers every train token exactly once
    train_tokens = sum(r["tokens"] for r in rows if r["split"] == "train")
    spans = layout.collect()
    assert sum(r["tok_len"] for r in spans) == train_tokens
    assert audit["train_docs"] == len(
        {r["doc_id"] for r in rows if r["split"] == "train"}
    )


def test_prepare_training_data_bins_layout(spark, sf_dir, tmp_path):
    """pack_layout='bins': every surviving train doc lands WHOLE in
    exactly one sequence, bins never overflow, and the layout feeds
    write_training_shards unchanged (schema parity with 'split')."""
    from letsearch_spark.pipeline import (
        PrepConfig,
        prepare_training_data,
        release_training_data,
        write_training_shards,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    cfg = PrepConfig(
        quality={"min_words": 25},
        fuzzy_dedup={"threshold": 0.8},
        seq_len=256,
        num_shards=4,
        pack_layout="bins",
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    rows = clean.collect()
    spans = layout.collect()
    train = {r["doc_id"]: r["tokens"] for r in rows if r["split"] == "train"}
    # exactly-once, whole-document, schema parity with pack_sequences
    assert sorted(r["doc_id"] for r in spans) == sorted(train)
    assert all(r["tok_begin"] == 0 for r in spans)
    assert all(r["tok_len"] == train[r["doc_id"]] for r in spans)
    per_bin = {}
    for r in spans:
        per_bin.setdefault((r["shard"], r["seq"]), 0)
        per_bin[(r["shard"], r["seq"])] += r["tok_len"]
    # no overflow (corpus docs fit 256 after the min_words filter, so
    # no own_seq singleton is expected either way)
    assert all(v <= 256 for v in per_bin.values())
    # egress consumes the bins layout unchanged
    out = str(tmp_path / "bin_shards")
    n = write_training_shards(clean, layout, out)
    assert n == len(spans)
    release_training_data(clean)

    with pytest.raises(ValueError, match="pack_shuffle_seed"):
        prepare_training_data(
            docs,
            PrepConfig(pack_layout="bins", pack_shuffle_seed=7),
        )
    with pytest.raises(ValueError, match="pack_layout"):
        prepare_training_data(docs, PrepConfig(pack_layout="nope"))


@pytest.mark.deep  # auditor tier (pytest.ini): double-run determinism storm; workdir_resume (default) compares resumed vs fresh bit-for-bit
def test_prepare_training_data_is_deterministic(spark, sf_dir):
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    cfg = PrepConfig(
        domain_col="lang",
        mixture_weights={"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1},
        mixture_target_rows=200,
        seq_len=128,
        num_shards=2,
    )
    a_clean, a_layout, a_audit = prepare_training_data(docs, cfg)
    b_clean, b_layout, b_audit = prepare_training_data(
        docs.repartition(11), cfg
    )
    assert a_audit == b_audit
    assert {tuple(r) for r in a_layout.collect()} == {
        tuple(r) for r in b_layout.collect()
    }
    a_keys = {(r["doc_id"], r["split"]) for r in a_clean.collect()}
    b_keys = {(r["doc_id"], r["split"]) for r in b_clean.collect()}
    assert a_keys == b_keys


def test_prepare_training_data_stage_toggles(spark, sf_dir):
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text").limit(100)
    cfg = PrepConfig(quality=None, line_dedup=None, fuzzy_dedup=None)
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert set(audit) == {"input", "train_docs"}
    assert clean.count() == audit["input"]

    with pytest.raises(ValueError, match="domain_col"):
        prepare_training_data(
            docs, PrepConfig(mixture_weights={"en": 1.0}, mixture_target_rows=10)
        )


def test_write_training_shards(spark, sf_dir, tmp_path):
    """Shards land partitioned by shard, rows ordered by (seq,
    seq_offset) within each file, and every span carries its text."""
    from letsearch_spark.pipeline import (
        PrepConfig,
        prepare_training_data,
        write_training_shards,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text").limit(200)
    clean, layout, _ = prepare_training_data(
        docs, PrepConfig(fuzzy_dedup=None, seq_len=128, num_shards=3)
    )
    out = str(tmp_path / "shards")
    n = write_training_shards(clean, layout, out)
    assert n == layout.count() > 0

    back = spark.read.parquet(out)
    assert back.count() == n
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shards <= {0, 1, 2}
    assert all(r["text"] for r in back.collect())

    # within-file ordering: read one shard file raw and check monotone
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    assert files
    for f in files:
        t = pq.read_table(f, columns=["seq", "seq_offset"]).to_pydict()
        pairs = list(zip(t["seq"], t["seq_offset"]))
        assert pairs == sorted(pairs), f


def test_pipeline_perplexity_stage(spark, sf_dir):
    """Optional CCNet stage: an LM trained on the corpus itself keeps
    typical documents and the audit records the stage."""
    from letsearch_spark.operators.ngram_lm import train_ngram_lm
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text").limit(150)
    lm = train_ngram_lm(docs, n=2, min_count=2)
    cfg = PrepConfig(
        quality=None,
        fuzzy_dedup=None,
        ppl_filter={"lm": lm, "max_ppl": 5_000.0, "n": 2},
        seq_len=256,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert 0 < audit["ppl_filter"] <= audit["input"]
    assert audit["line_dedup"] <= audit["ppl_filter"]


def test_pipeline_c4_stage(spark, sf_dir):
    """Optional C4 stage: lines are rewritten before the page filter,
    the audit records the stage, and combining c4 with pre-supplied
    token counts raises (rewritten text invalidates the counts)."""
    import pytest

    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    # the synthetic corpus has no punctuation (C4 would rightly drop it
    # all); stamp sentence structure on: a period per 10 words, a line
    # break per 3 sentences
    docs = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.regexp_replace(
                F.regexp_replace("text", r"((\S+\s+){9}\S+)\s*", "$1. "),
                r"(([^.]+\.\s*){3})",
                "$1\n",
            ).alias("text"),
        )
        .limit(150)
    )
    cfg = PrepConfig(
        quality=None,
        fuzzy_dedup=None,
        c4={"min_line_words": 2, "min_sentences": 1},
        seq_len=256,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert 0 < audit["c4"] <= audit["input"]
    assert audit["line_dedup"] <= audit["c4"]
    # every surviving line obeys the line rules (spot the rewrite)
    import re

    for r in clean.select("text").limit(20).collect():
        for ln in r["text"].split("\n"):
            assert re.search(r'[.!?]["”\'’]?\s*$', ln), ln

    with pytest.raises(ValueError, match="token_count_col"):
        prepare_training_data(
            docs.withColumn("tc", F.lit(10)),
            PrepConfig(c4={}, line_dedup=None, token_count_col="tc"),
        )


def test_pipeline_dsir_stage(spark, sf_dir):
    """Optional DSIR stage: selecting against a target corpus of 'en'
    docs keeps exactly k docs and the audit records the stage."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text").limit(150)
    target = docs.where(F.col("lang") == "en").limit(20)
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        dsir={"target": target, "k": 60, "num_buckets": 1024},
        seq_len=256,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert audit["dsir"] == 60
    assert clean.count() == 60
    assert layout.count() > 0


def test_pipeline_quality_classifier_stage(spark, sf_dir):
    """Optional model-based quality filter: a classifier trained
    good-vs-spam drops the spam-looking docs, the audit records the
    stage, and threshold mode is deterministic."""
    from letsearch_spark.operators.classifier import fit_quality_classifier
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    good = spark.createDataFrame(
        [(i, "the report presents careful analysis of measured results") for i in range(10)],
        "doc_id long, text string",
    )
    spam = spark.createDataFrame(
        [(i, "buy now click here free winner casino bonus offer") for i in range(10)],
        "doc_id long, text string",
    )
    model = fit_quality_classifier(good, spam, num_buckets=256, iterations=30)

    docs = spark.createDataFrame(
        [
            (i, "careful analysis of the measured report results" if i < 30 else "free casino bonus click now winner offer")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        quality_classifier={"model": model, "mode": "threshold", "threshold": 0.5},
        seq_len=128,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert audit["quality_classifier"] == 30
    assert {r["doc_id"] for r in clean.select("doc_id").collect()} == set(range(30))
    assert layout.count() > 0


def test_pipeline_ngram_dedup_stage(spark):
    """Optional span-dedup stage: cross-doc boilerplate spans are
    stripped outside the keeper doc, the audit records the stage, and
    combining with pre-supplied token counts raises."""
    import pytest

    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    boiler = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(i, f"doc {i} says {boiler} and more unique text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        ngram_dedup={"width": 10},
        seq_len=64,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert audit["ngram_dedup"] == 20
    texts = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert boiler in texts[0]
    assert all(boiler not in texts[i] for i in range(1, 20))

    with pytest.raises(ValueError, match="ngram-dedup"):
        prepare_training_data(
            docs.withColumn("tc", docs.doc_id + 10),
            PrepConfig(ngram_dedup={}, line_dedup=None, token_count_col="tc"),
        )


def test_pipeline_domain_cap_stage(spark, sf_dir):
    """Optional per-domain cap: at most k survivors per domain, audited,
    and requiring a strata column."""
    import os

    import pytest

    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        domain_col="source",
        domain_cap={"k": 5},
        split_weights=None,
        seq_len=128,
        num_shards=2,
    )
    clean, _, audit = prepare_training_data(docs, cfg)
    counts = {
        r["source"]: r["n"]
        for r in clean.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts and all(n <= 5 for n in counts.values())
    assert audit["domain_cap"] == sum(counts.values())

    with pytest.raises(ValueError, match="domain_cap"):
        prepare_training_data(
            docs,
            PrepConfig(
                quality=None, line_dedup=None, fuzzy_dedup=None,
                domain_cap={"k": 5},
            ),
        )


def test_pipeline_fuzzy_keep_best(spark):
    """fuzzy_dedup with keep_best_col keeps each near-dup cluster's
    highest-score member instead of the lowest id."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{base} end", 10.0),
        (2, f"{base} end longer", 99.0),
        (3, "completely different content about spark shuffles and joins", 1.0),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, score double")
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup={"threshold": 0.5, "keep_best_col": "score"},
        split_weights=None,
        seq_len=64,
        num_shards=1,
    )
    clean, _, audit = prepare_training_data(docs, cfg)
    kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert kept == [2, 3]  # doc 2 outranks its near-dup doc 1 on score
    assert audit["fuzzy_dedup"] == 2

    # default min-id rule on the same corpus keeps doc 1 instead
    cfg2 = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup={"threshold": 0.5},
        split_weights=None,
        seq_len=64,
        num_shards=1,
    )
    clean2, _, _ = prepare_training_data(docs, cfg2)
    assert sorted(r["doc_id"] for r in clean2.select("doc_id").collect()) == [1, 3]


def test_pipeline_decontaminate_stage(spark):
    """Optional benchmark-decontamination stage: a corpus document that
    embeds an eval probe verbatim is dropped, clean documents survive,
    and the audit records the stage."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    probe = "the quick brown fox jumps over the lazy dog tonight"
    uniq = [
        f"document {i} carries its own distinct prose about topic {i} "
        f"with nothing shared beyond ordinary words {i}"
        for i in range(12)
    ]
    # doc 0 embeds the probe verbatim inside a longer document
    texts = [f"intro text then {probe} and a long tail of filler"] + uniq[1:]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    probes = spark.createDataFrame([(100, probe)], "pid long, ptext string")
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        decontaminate={
            "probes": probes,
            "probe_id": "pid",
            "probe_text": "ptext",
            "n": 3,
            "threshold": 0.8,
        },
        seq_len=64,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 0 not in kept
    assert kept == set(range(1, 12))
    assert audit["decontaminate"] == 11
    assert audit["input"] == 12

    # the broadcast-Bloom path must make the identical decision
    import dataclasses

    bloom_cfg = dataclasses.replace(
        cfg, decontaminate={**cfg.decontaminate, "method": "bloom"}
    )
    clean_b, _, audit_b = prepare_training_data(docs, bloom_cfg)
    assert {r["doc_id"] for r in clean_b.select("doc_id").collect()} == kept
    assert audit_b["decontaminate"] == 11

    with pytest.raises(ValueError, match="method"):
        prepare_training_data(
            docs,
            dataclasses.replace(
                cfg, decontaminate={**cfg.decontaminate, "method": "nope"}
            ),
        )


def test_corpus_report_matches_python_twin(spark, sf_dir):
    """corpus_report's per-domain rows and grand total must equal an
    independent Python aggregation over the same documents (same word
    split, same ceil(words*1.3) token rule, same HALF_UP round-6);
    null/blank text counts as a zero-word document so
    avg == total/n always holds, and a real domain literally named
    'ALL' stays distinct from the is_total row."""
    import math
    import re
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from letsearch_spark.pipeline import corpus_report

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    # adversarial rows: a null-text doc, a blank-text doc, a null
    # domain, and a domain literally named 'ALL'
    extra = spark.createDataFrame(
        [
            (100001, "en", None),
            (100002, "de", "   "),
            (100003, None, "null domain words here"),
            (100004, "ALL", "domain named all words"),
        ],
        docs.schema,
    )
    docs = docs.unionByName(extra)
    rows = corpus_report(docs, domain_col="lang").collect()
    got = {(r["domain"], r["is_total"]): r.asDict() for r in rows}
    assert len(got) == len(rows)  # (domain, is_total) is unambiguous

    TOTAL = ("__total__",)  # local marker, can't collide with a domain
    acc = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in docs.collect():
        t = r["text"]
        blank = t is None or t.strip() == ""
        w = 0 if blank else len(re.split(r"\s+", t.strip().lower()))
        for dom in (r["lang"], TOTAL):
            a = acc[dom]
            a[0] += 1
            a[1] += 1 if blank else 0
            a[2] += 0 if t is None else len(t)
            a[3] += w
            a[4] += math.ceil(w * 1.3)
            a[5] = max(a[5], 0 if t is None else len(t))

    assert set(got) == {
        (d, False) for d in acc if d != TOTAL
    } | {(None, True)}
    for dom, (n, empty, chars, wsum, toks, maxc) in acc.items():
        g = got[(None, True) if dom == TOTAL else (dom, False)]
        assert g["n_docs"] == n
        assert g["n_empty"] == empty
        assert g["total_chars"] == chars
        assert g["total_words"] == wsum
        assert g["total_tokens"] == toks
        assert g["max_chars"] == maxc
        want_avg = float(
            Decimal(repr(wsum / n)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        assert abs(g["avg_words"] - want_avg) < 1e-9
        # internal consistency the data card promises
        assert abs(g["avg_words"] - round(g["total_words"] / g["n_docs"], 6)) < 1e-6

    # domain_col=None: exactly the one total row
    total = corpus_report(docs).collect()
    assert len(total) == 1 and total[0]["is_total"] and total[0]["domain"] is None
    assert total[0]["n_docs"] == acc[TOTAL][0]


def test_write_token_shards_roundtrip(spark, tmp_path):
    """Token-id shard egress: spans reconstruct every document's exact
    BPE id stream, each (shard, seq) streams in order, and a layout
    whose counts disagree with the model raises instead of truncating."""
    import pytest
    from pyspark.sql import functions as F

    from letsearch_spark.operators.pack import pack_sequences
    from letsearch_spark.pipeline import write_token_shards
    from letsearch_spark.tokenizer import token_count_exact, train_bpe

    docs = spark.createDataFrame(
        [
            (i, f"doc {i} low lower lowest new newer newest wide "
                f"widest word{i % 7} " + "pad " * (i % 5))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    model = train_bpe(docs, "text", vocab_size=80)
    counted = docs.join(
        token_count_exact(docs, "doc_id", "text", model), "doc_id"
    )
    layout = pack_sequences(counted, "doc_id", "n_tokens", seq_len=32, num_shards=3)
    out = str(tmp_path / "tok_shards")
    n = write_token_shards(counted, layout, out, model)
    assert n == layout.count()

    back = spark.read.parquet(out)
    rows = back.collect()
    # per-document reconstruction: spans ordered by tok_begin tile the
    # exact driver-side encoding
    id_of = {t: i for i, t in enumerate(model.vocab)}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in docs.collect():
        want = [id_of[t] for t in model.encode(r["text"])]
        if not want:
            continue
        got = []
        for s in sorted(by_doc[r["doc_id"]], key=lambda x: x["tok_begin"]):
            got.extend(s["token_ids"])
        assert got == want, r["doc_id"]
    # every (shard, seq) except a shard's last tiles [0, 32)
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq"]), []).append(r)
    for (sh, sq), spans in by_seq.items():
        spans.sort(key=lambda x: x["seq_offset"])
        pos = 0
        for s in spans:
            assert s["seq_offset"] == pos
            assert len(s["token_ids"]) == s["tok_len"]
            pos += s["tok_len"]
        last_seq = max(q for (h, q) in by_seq if h == sh)
        if sq != last_seq:
            assert pos == 32

    # approximate counts != exact ids -> loud failure, not truncation
    from letsearch_spark.functions.text import token_count_approx

    bad = docs.withColumn("n_tokens", token_count_approx(F.col("text")))
    bad_layout = pack_sequences(bad, "doc_id", "n_tokens", seq_len=32, num_shards=2)
    with pytest.raises(Exception, match="token_count_exact|disagrees"):
        write_token_shards(bad, bad_layout, str(tmp_path / "bad"), model)

    # UNDER-counts must also raise (they would silently drop each
    # document's trailing tokens, not slice out of range)
    under = counted.withColumn("n_tokens", F.col("n_tokens") - 1)
    under_layout = pack_sequences(
        under, "doc_id", "n_tokens", seq_len=32, num_shards=2
    )
    with pytest.raises(Exception, match="token_count_exact|disagrees"):
        write_token_shards(under, under_layout, str(tmp_path / "under"), model)


def test_decontaminate_method_auto(spark):
    """method='auto' (the round-6 default): the corpus row count picks
    join below the crossover and Bloom at/above it, the chosen path is
    recorded in the audit, and results are identical to BOTH explicit
    methods regardless of which side of the threshold the corpus is on
    (the two paths are bit-identical by construction). Path-specific
    knobs (fpp) must not leak into the join call when auto lands there.
    """
    import dataclasses

    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    probe = "the quick brown fox jumps over the lazy dog tonight"
    texts = [f"intro text then {probe} and a long tail of filler"] + [
        f"document {i} carries its own distinct prose about topic {i} "
        f"with nothing shared beyond ordinary words {i}"
        for i in range(1, 12)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    probes = spark.createDataFrame([(100, probe)], "pid long, ptext string")
    base = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        decontaminate={
            "probes": probes,
            "probe_id": "pid",
            "probe_text": "ptext",
            "n": 3,
            "threshold": 0.8,
            "fpp": 0.01,  # Bloom-only knob: filtered out on the join path
        },
        seq_len=64,
        num_shards=2,
    )

    def run(**decon_extra):
        cfg = dataclasses.replace(
            base, decontaminate={**base.decontaminate, **decon_extra}
        )
        clean, _, audit = prepare_training_data(docs, cfg)
        return {r["doc_id"] for r in clean.select("doc_id").collect()}, audit

    # 12-doc corpus: below a 1000-doc threshold -> join, at/above a
    # 5-doc threshold -> bloom
    kept_lo, audit_lo = run(method="auto", auto_threshold_docs=1000)
    assert audit_lo["decontaminate_method"] == "join"
    kept_hi, audit_hi = run(method="auto", auto_threshold_docs=5)
    assert audit_hi["decontaminate_method"] == "bloom"

    kept_join, audit_join = run(method="join")
    kept_bloom, _ = run(method="bloom")
    assert kept_lo == kept_hi == kept_join == kept_bloom == set(range(1, 12))
    # explicit methods don't record an auto decision
    assert "decontaminate_method" not in audit_join


def test_pipeline_html_stage(spark):
    """Optional stage 0 (round 6): raw crawl HTML in -> extracted text
    through the rest of the recipe. Link-dense pages drop when
    max_link_density is set, tag-empty pages drop on the length guard,
    the audit records the stage, and token_count_col refuses the
    combination (extraction rewrites text)."""
    import pytest as _pytest

    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    body = " ".join(
        f"the word{i} of common prose and a line that is fine" for i in range(6)
    )
    pages = [
        (0, f"<html><head><title>ok</title></head><body><p>{body}</p></body></html>"),
        (1, "<html><body>" + "".join(f'<a href="/l{i}">l{i}</a>' for i in range(40)) + " nav only</body></html>"),
        (2, "<html><body><script>var x=1;</script></body></html>"),
        (3, f"<div>{body} two</div>"),
    ]
    docs = spark.createDataFrame(pages, "doc_id long, text string")
    cfg = PrepConfig(
        html={"max_link_density": 0.5},
        quality={"min_words": 5},
        line_dedup=None,
        fuzzy_dedup=None,
        seq_len=64,
        num_shards=2,
    )
    clean, _, audit = prepare_training_data(docs, cfg)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == {0, 3}  # 1 = link farm, 2 = tag-empty
    assert audit["html"] == 2
    texts = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert "<" not in texts[0] and "title" not in texts[0]

    with _pytest.raises(ValueError, match="token_count_col"):
        prepare_training_data(
            docs,
            PrepConfig(
                html={}, token_count_col="tc", fuzzy_dedup=None, seq_len=64
            ),
        )
    with _pytest.raises(ValueError, match="unknown html options"):
        prepare_training_data(
            docs, PrepConfig(html={"nope": 1}, fuzzy_dedup=None, seq_len=64)
        )


def test_workdir_resume(spark, sf_dir, tmp_path):
    """Resumable checkpointing (round 6): a rerun with the same workdir
    loads every stage from parquet (audit['resumed']), outputs equal
    the fresh run bit-for-bit, editing a LATE stage's config recomputes
    only it and its downstream, and editing an EARLY stage invalidates
    the whole chain."""
    import dataclasses

    from letsearch_spark.pipeline import (
        PrepConfig,
        prepare_training_data,
        release_training_data,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wd = str(tmp_path / "wd")
    cfg = PrepConfig(
        quality={"min_words": 25},
        fuzzy_dedup={"threshold": 0.8},
        seq_len=256,
        num_shards=4,
        workdir=wd,
    )

    def snap(clean, layout):
        rows = sorted(
            (r["doc_id"], r["split"], r["tokens"]) for r in clean.collect()
        )
        lay = sorted(tuple(r) for r in layout.collect())
        return rows, lay

    clean1, layout1, audit1 = prepare_training_data(docs, cfg)
    s1 = snap(clean1, layout1)
    assert audit1["resumed"] == []

    clean2, layout2, audit2 = prepare_training_data(docs, cfg)
    s2 = snap(clean2, layout2)
    assert audit2["resumed"] == ["quality_filter", "line_dedup", "fuzzy_dedup"]
    assert s2 == s1
    assert {k: v for k, v in audit2.items() if k != "resumed"} == {
        k: v for k, v in audit1.items() if k != "resumed"
    }

    # no-workdir reference run: identical outputs
    clean0, layout0, audit0 = prepare_training_data(
        docs, dataclasses.replace(cfg, workdir=None)
    )
    assert snap(clean0, layout0) == s1
    release_training_data(clean0)

    # late-stage edit: quality + line_dedup load, fuzzy recomputes
    cfg_late = dataclasses.replace(cfg, fuzzy_dedup={"threshold": 0.6})
    _, _, audit3 = prepare_training_data(docs, cfg_late)
    assert audit3["resumed"] == ["quality_filter", "line_dedup"]
    assert audit3["fuzzy_dedup"] <= audit1["fuzzy_dedup"]

    # early-stage edit: the chain shifts, nothing loads
    cfg_early = dataclasses.replace(cfg, quality={"min_words": 30})
    _, _, audit4 = prepare_training_data(docs, cfg_early)
    assert audit4["resumed"] == []


def test_workdir_fingerprint_covers_content_and_columns(spark, tmp_path):
    """ADVICE r6: fp_0 must cover more than the row count -- a
    same-row-count but content-changed corpus, or renamed key/text
    columns, must NOT load stale stage parquet."""
    import dataclasses

    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    texts = [
        (i, f"document {i} has plenty of ordinary words " * 6) for i in range(30)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    cfg = PrepConfig(
        quality={"min_words": 10},
        fuzzy_dedup=None,
        seq_len=128,
        num_shards=2,
        workdir=str(tmp_path / "wd"),
    )
    _, _, a1 = prepare_training_data(docs, cfg)
    assert a1["resumed"] == []

    # the unchanged corpus resumes (the signature is stable)
    _, _, a1b = prepare_training_data(docs, cfg)
    assert a1b["resumed"] == ["quality_filter", "line_dedup"]

    # same count, different keys -> full recompute
    docs_shift = docs.withColumn("doc_id", F.col("doc_id") + 1000)
    _, _, a2 = prepare_training_data(docs_shift, cfg)
    assert a2["resumed"] == []

    # same count, same keys, different text (within the first 128
    # bytes) -> full recompute
    docs_edit = docs.withColumn(
        "text", F.concat(F.lit("EDITED "), F.col("text"))
    )
    _, _, a3 = prepare_training_data(docs_edit, cfg)
    assert a3["resumed"] == []

    # renamed key/text columns over identical data -> full recompute
    renamed = docs.withColumnsRenamed({"doc_id": "k", "text": "body"})
    cfg_r = dataclasses.replace(cfg, key_col="k", text_col="body")
    _, _, a4 = prepare_training_data(renamed, cfg_r)
    assert a4["resumed"] == []


def test_workdir_resume_restores_decon_method(spark, tmp_path):
    """The auto-chosen decontamination method is part of the audit; a
    resumed run must restore it from the stage marker instead of
    re-deciding (the count that drives 'auto' is never recomputed)."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    probe = "the quick brown fox jumps over the lazy dog tonight"
    texts = [f"intro text then {probe} and a long tail of filler"] + [
        f"document {i} carries the distinct prose of a topic {i} "
        f"and is about nothing shared beyond ordinary words {i}"
        for i in range(1, 12)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    probes = spark.createDataFrame([(100, probe)], "pid long, ptext string")
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        decontaminate={
            "probes": probes,
            "probe_id": "pid",
            "probe_text": "ptext",
            "threshold": 0.8,
            "method": "auto",
            "auto_threshold_docs": 5,
        },
        seq_len=64,
        num_shards=2,
        workdir=str(tmp_path / "wd"),
    )
    _, _, a1 = prepare_training_data(docs, cfg)
    assert a1["decontaminate_method"] == "bloom" and a1["resumed"] == []
    _, _, a2 = prepare_training_data(docs, cfg)
    assert a2["resumed"] == ["decontaminate"]
    assert a2["decontaminate_method"] == "bloom"
    assert a2["decontaminate"] == a1["decontaminate"]


def test_pipeline_compression_stage(spark, sf_dir):
    """Optional compression stage: the planted boilerplate doc (zlib
    ratio near zero) drops, the word-salad corpus survives, and the
    audit records the stage."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    base = _docs(spark, sf_dir).select("doc_id", "text").limit(60)
    junk = spark.createDataFrame(
        [(100001, "click here buy now " * 150)], "doc_id long, text string"
    )
    docs = base.unionByName(junk)
    cfg = PrepConfig(
        quality=None,
        fuzzy_dedup=None,
        # max_ratio raised past the default: zlib's fixed header makes
        # very short docs (present in the synthetic corpus) exceed 1.05
        compression={"min_ratio": 0.2, "max_ratio": 1.2},
        seq_len=256,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert audit["compression"] == audit["input"] - 1
    assert clean.where(F.col("doc_id") == 100001).count() == 0


def test_pipeline_url_filter_stage(spark, sf_dir):
    """Optional URL-filter stage (r8, stage 0a): pages drop on their
    URL alone -- blocked hosts (www-spelled) and session-id patterns
    gone before any text stage, audit records the stage, missing
    url_col raises."""
    import pytest

    from letsearch_spark.pipeline import (
        PrepConfig,
        prepare_training_data,
        release_training_data,
    )

    docs = (
        _docs(spark, sf_dir)
        .limit(60)
        .withColumn(
            "url",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("https://www.blocked.example.com/p/"),
                    F.col("doc_id").cast("string"),
                ),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(
                    F.lit("https://ok.example.org/item?session="),
                    F.col("doc_id").cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("https://clean.example.org/a/"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )
    )
    n_clean = docs.where(F.col("doc_id") % 3 == 2).count()
    cfg = PrepConfig(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        url_filter={
            "url_col": "url",
            "blocked_hosts": ["blocked.example.com"],
            "blocked_patterns": [r"[?&]session="],
        },
        seq_len=256,
        num_shards=2,
    )
    clean, layout, audit = prepare_training_data(docs, cfg)
    assert audit["url_filter"] == n_clean
    urls = [r["url"] for r in clean.select("url").collect()]
    assert urls and all("clean.example.org" in u for u in urls)
    release_training_data(clean)

    with pytest.raises(ValueError, match="url_col"):
        prepare_training_data(
            docs, PrepConfig(url_filter={}, fuzzy_dedup=None)
        )


def test_write_token_shards_byte_bpe(spark, tmp_path):
    """r9: write_token_shards dispatches on the model type -- a
    ByteBpeModel's id streams reconstruct exactly (layout counts from
    token_count_exact_bytebpe under the same model)."""
    from pyspark.sql import functions as F

    from letsearch_spark.operators.pack import pack_sequences
    from letsearch_spark.pipeline import write_token_shards
    from letsearch_spark.tokenizer_bytebpe import (
        token_count_exact_bytebpe,
        train_byte_bpe,
    )

    docs = spark.createDataFrame(
        [
            (i, f"doc {i} unicode 中文 mix_{i % 3} newer newest "
                + "pad " * (i % 4))
            for i in range(25)
        ],
        "doc_id long, text string",
    )
    model = train_byte_bpe(docs, "text", vocab_size=300)
    counted = docs.join(
        token_count_exact_bytebpe(docs, "doc_id", "text", model), "doc_id"
    )
    layout = pack_sequences(
        counted, "doc_id", "n_tokens", seq_len=24, num_shards=2
    )
    out = str(tmp_path / "bb_shards")
    n = write_token_shards(counted, layout, out, model)
    assert n == layout.count()

    back = spark.read.parquet(out)
    id_of = {t: i for i, t in enumerate(model.vocab)}
    by_doc = {}
    for r in back.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in docs.collect():
        want = [id_of[t] for t in model.encode(r["text"])]
        got = []
        for s in sorted(by_doc[r["doc_id"]], key=lambda x: x["tok_begin"]):
            got.extend(s["token_ids"])
        assert got == want, r["doc_id"]


def test_write_token_shards_unigram_and_type_guard(spark, tmp_path):
    """r9 review catch: a UnigramModel must route to its own id
    encoder (it used to crash on .merges in the word-BPE branch), and
    an unsupported model type raises clearly."""
    import pytest

    from pyspark.sql import functions as F

    from letsearch_spark.operators.pack import pack_sequences
    from letsearch_spark.pipeline import write_token_shards
    from letsearch_spark.tokenizer_unigram import (
        token_count_exact_unigram,
        train_unigram,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} low lower lowest wide widest " + "pad " * (i % 3))
         for i in range(20)],
        "doc_id long, text string",
    )
    model = train_unigram(docs, "text", vocab_size=60, seed_size=200,
                          em_iters=1)
    counted = docs.join(
        token_count_exact_unigram(docs, "doc_id", "text", model), "doc_id"
    )
    layout = pack_sequences(counted, "doc_id", "n_tokens", seq_len=16,
                            num_shards=2)
    out = str(tmp_path / "uni_shards")
    n = write_token_shards(counted, layout, out, model)
    assert n == layout.count()
    back = spark.read.parquet(out)
    vocab = model.vocab
    by_doc = {}
    for r in back.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in docs.collect():
        want = [vocab.index(t) if t in vocab else -1
                for t in model.encode(r["text"])]
        got = []
        for s in sorted(by_doc[r["doc_id"]], key=lambda x: x["tok_begin"]):
            got.extend(s["token_ids"])
        assert got == want, r["doc_id"]

    with pytest.raises(TypeError, match="BpeModel"):
        write_token_shards(counted, layout, str(tmp_path / "x"), object())


def test_prep_fim_stage(spark):
    """PrepConfig(fim=...) (r9): the objective transform rewrites text
    before split/count/pack (so the layout counts the REWRITTEN text),
    marks rows with fim_applied, and stays incompatible with
    token_count_col like every other rewriting stage."""
    import pytest

    from pyspark.sql import functions as F

    from letsearch_spark.functions.text import fim_transform
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some filler words here " * 2)
         for i in range(30)],
        "doc_id long, text string",
    )
    out, _layout, audit = prepare_training_data(
        docs,
        PrepConfig(
            quality=None, fuzzy_dedup=None, line_dedup=None,
            fim={"rate": 1.0, "seed": 5},
            split_weights=None,
        ),
    )
    assert audit["fim"] == 30
    rows = out.collect()
    assert all(r["fim_applied"] for r in rows)
    # text equals the operator applied directly (same seed/rate)
    want = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            fim_transform(F.col("doc_id"), F.col("text"), seed=5, rate=1.0)[
                "text"
            ].alias("t"),
        ).collect()
    }
    for r in rows:
        assert r["text"] == want[r["doc_id"]]
        assert "<fim_middle>" in r["text"]
    # tokens counted on the REWRITTEN text
    got_tok = {r["doc_id"]: r["tokens"] for r in rows}
    import math
    for r in rows:
        assert got_tok[r["doc_id"]] == math.ceil(
            len(r["text"].split()) * 1.3
        )

    with pytest.raises(ValueError, match="token_count_col"):
        prepare_training_data(
            docs.withColumn("n_tok", F.lit(5)),
            PrepConfig(
                quality=None, fuzzy_dedup=None, line_dedup=None,
                fim={"rate": 1.0}, token_count_col="n_tok",
                split_weights=None,
            ),
        )


def test_write_token_shards_wordpiece(spark, tmp_path):
    """r10: write_token_shards routes a WordPieceModel to the greedy id
    encoder -- id streams reconstruct exactly (layout counts from
    token_count_exact_wordpiece under the same model), and [UNK] ids
    appear as REAL vocab positions for untileable words."""
    from letsearch_spark.operators.pack import pack_sequences
    from letsearch_spark.pipeline import write_token_shards
    from letsearch_spark.tokenizer_wordpiece import (
        UNK,
        token_count_exact_wordpiece,
        train_wordpiece,
    )

    docs = spark.createDataFrame(
        [
            # every 5th doc carries a word past the word_max_chars
            # guard -> [UNK] on BOTH the counting and encoding passes
            (i, f"doc {i} the theme there mix other mother "
                + ("x" * 120 + " " if i % 5 == 0 else "")
                + "pad " * (i % 4))
            for i in range(25)
        ],
        "doc_id long, text string",
    )
    model = train_wordpiece(docs, "text", vocab_size=120)
    counted = docs.join(
        token_count_exact_wordpiece(docs, "doc_id", "text", model), "doc_id"
    )
    layout = pack_sequences(
        counted, "doc_id", "n_tokens", seq_len=24, num_shards=2
    )
    out = str(tmp_path / "wp_shards")
    n = write_token_shards(counted, layout, out, model)
    assert n == layout.count()

    back = spark.read.parquet(out)
    id_of = {t: i for i, t in enumerate(model.vocab)}
    by_doc = {}
    for r in back.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    unk_seen = False
    for r in docs.collect():
        want = [id_of[t] for t in model.encode(r["text"])]
        got = []
        for s in sorted(by_doc[r["doc_id"]], key=lambda x: x["tok_begin"]):
            got.extend(s["token_ids"])
        assert got == want, r["doc_id"]
        unk_seen = unk_seen or id_of[UNK] in got
    assert unk_seen  # the untrained-script word really exercised [UNK]
