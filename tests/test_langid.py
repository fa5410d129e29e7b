"""Char-n-gram language ID (operators/langid.py, r10): Spark-vs-twin
bit-parity, >= 20-language accuracy on the synthetic fixture, plan
shape (broadcast join + integer aggregation, no Python UDF, no
window), and the prep-pipeline stage."""

import pytest
from pyspark.sql import functions as F

from letsearch_spark.operators.langid import (
    MULTILINGUAL_VOCAB,
    fit_langid,
    fit_langid_twin,
    predict_lang,
    predict_lang_twin,
    synthetic_multilingual_corpus,
)


@pytest.fixture(scope="module")
def corpus():
    rows = synthetic_multilingual_corpus(docs_per_lang=24)
    train = [r for r in rows if r[0] % 2 == 0]
    test = [r for r in rows if r[0] % 2 == 1]
    return train, test


@pytest.fixture(scope="module")
def model(spark, corpus):
    train, _ = corpus
    return fit_langid(
        spark.createDataFrame(train, "doc_id long, lang string, text string")
    )


def test_fit_matches_twin_bitwise(spark, corpus, model):
    """Both fit methods (the default Arrow kernel and the Catalyst
    explode twin) freeze the identical model as the pure-Python twin
    -- the kernel shares the twin's gram code, so the Catalyst leg is
    the independent cross-check."""
    train, _ = corpus
    twin = fit_langid_twin([(r[1], r[2]) for r in train])
    cat = fit_langid(
        spark.createDataFrame(
            train, "doc_id long, lang string, text string"
        ),
        method="catalyst",
    )
    for m in (model, cat):
        assert m.langs == twin.langs
        assert m.logp0_micro == twin.logp0_micro
        assert m.delta_micro == twin.delta_micro


def test_fit_is_partitioning_invariant(spark, corpus, model):
    """Integer count aggregation: any partitioning gives the identical
    frozen model."""
    train, _ = corpus
    df = spark.createDataFrame(
        train, "doc_id long, lang string, text string"
    ).repartition(13)
    m2 = fit_langid(df)
    assert (m2.langs, m2.logp0_micro, m2.delta_micro) == (
        model.langs,
        model.logp0_micro,
        model.delta_micro,
    )


def test_accuracy_26_languages_heldout(spark, corpus, model):
    """>= 20 languages (the VERDICT r9 #4 bar): held-out accuracy on
    the fixture must be essentially perfect -- the vocabularies
    overlap heavily across the Scandinavian/Romance groups, so this is
    not a trivial split."""
    _, test = corpus
    assert len(MULTILINGUAL_VOCAB) >= 20
    preds = predict_lang(
        spark.createDataFrame(test, "doc_id long, lang string, text string"),
        model,
    ).collect()
    truth = {r[0]: r[1] for r in test}
    assert len(preds) == len(test)
    acc = sum(1 for r in preds if r["pred_lang"] == truth[r["doc_id"]]) / len(
        preds
    )
    assert acc >= 0.98, acc


def test_predict_matches_twin_and_partitioning(spark, corpus, model):
    """Micro-unit integer scores: BOTH predict methods == pure-Python
    twin exactly, at any partitioning (the Catalyst leg is the
    independent cross-check of the kernel's hashing/normalization)."""
    _, test = corpus
    want = sorted(predict_lang_twin([(r[0], r[2]) for r in test], model))
    for nparts in (1, 7):
        df = spark.createDataFrame(
            test, "doc_id long, lang string, text string"
        ).repartition(nparts)
        for method in ("kernel", "catalyst"):
            got = sorted(
                (r["doc_id"], r["pred_lang"], r["score_micro"])
                for r in predict_lang(df, model, method=method).collect()
            )
            assert got == want, method
    with pytest.raises(ValueError, match="unknown method"):
        predict_lang(
            spark.createDataFrame(test[:1], "doc_id long, lang string, text string"),
            model,
            method="fast",
        )


def test_empty_null_and_unseen_script(spark, model):
    """Empty/null text still yields exactly one deterministic row (the
    all-boundary grams score; ties resolve to the smallest language
    index), and text in no trained script degrades to SOME answer, not
    an error or a dropped row."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "აბ გ")],  # Georgian
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in predict_lang(df, model).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["pred_lang"] == rows[2]["pred_lang"]
    assert rows[1]["score_micro"] == rows[2]["score_micro"]
    twin = predict_lang_twin([(1, ""), (2, None), (3, "აბ გ")], model)
    assert sorted(
        (r["doc_id"], r["pred_lang"], r["score_micro"]) for r in rows.values()
    ) == sorted(twin)


def test_predict_plan_shape(spark, corpus, model):
    """Serving-scale plan gates: the default kernel path is MAP-ONLY
    (one MapInPandas, zero exchanges/joins); the Catalyst twin has no
    Python evaluation, a broadcast weight join, and no window."""
    _, test = corpus
    df = spark.createDataFrame(
        test, "doc_id long, lang string, text string"
    )
    kplan = (
        predict_lang(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in kplan, kplan
    assert "Exchange" not in kplan, kplan
    assert "Join" not in kplan, kplan

    plan = (
        predict_lang(df, model, method="catalyst")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_training_skips_null_labels(spark):
    df = spark.createDataFrame(
        [("en", "the cat and the dog"), (None, "und und und")],
        "lang string, text string",
    )
    m = fit_langid(df, "lang", "text")
    assert m.langs == ["en"]


def test_pipeline_langid_stage(spark, corpus, model):
    """PrepConfig(langid=...): annotate-only keeps every row and adds
    the prediction column; 'allowed' filters; bad knobs raise."""
    from letsearch_spark.pipeline import PrepConfig, prepare_training_data

    _, test = corpus
    df = spark.createDataFrame(
        test[:60], "doc_id long, lang string, text string"
    )
    base = dict(
        quality=None,
        line_dedup=None,
        fuzzy_dedup=None,
        split_weights=None,
    )
    out, _layout, audit = prepare_training_data(
        df, PrepConfig(langid={"model": model}, **base)
    )
    assert "pred_lang" in out.columns
    assert audit["langid"] == 60
    truth = {r[0]: r[1] for r in test[:60]}
    got = {r["doc_id"]: r["pred_lang"] for r in out.collect()}
    acc = sum(1 for k, v in got.items() if v == truth[k]) / len(got)
    assert acc >= 0.95

    langs_in_slice = sorted({r[1] for r in test[:60]})
    keep = langs_in_slice[:1]
    out2, _layout2, audit2 = prepare_training_data(
        df, PrepConfig(langid={"model": model, "allowed": keep}, **base)
    )
    assert audit2["langid"] < 60
    assert {r["pred_lang"] for r in out2.collect()} == set(keep)

    with pytest.raises(ValueError, match="unknown langid"):
        prepare_training_data(
            df, PrepConfig(langid={"model": model, "bogus": 1}, **base)
        )
    with pytest.raises(ValueError, match="needs 'model'"):
        prepare_training_data(df, PrepConfig(langid={}, **base))
