"""Dataset snapshot diff (operators/diff.py): per-key statuses, null
handling, multi-column compare, the hash-only join shape, and the
summary counts. The end-to-end SQL parity runs as the dataset_diff
staged oracle in test_rotated_contract.py."""

import pytest
from pyspark.sql import functions as F


def _frames(spark):
    old = spark.createDataFrame(
        [
            (1, "same", "en"),
            (2, "will change", "en"),
            (3, "will be removed", "de"),
            (4, None, "en"),  # null text, unchanged
            (5, "meta changes only", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "same", "en"),
            (2, "changed!", "en"),
            (4, None, "en"),
            (5, "meta changes only", "fr"),
            (6, "brand new", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    return old, new


def test_statuses_text_only(spark):
    from letsearch_spark.operators.diff import dataset_diff

    old, new = _frames(spark)
    got = {
        r["doc_id"]: r["status"]
        for r in dataset_diff(old, new, "doc_id", ["text"]).collect()
    }
    # lang is not compared, so doc 5 reads unchanged here
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "unchanged",
        6: "added",
    }


def test_multi_column_compare_and_null_vs_empty(spark):
    from letsearch_spark.operators.diff import dataset_diff

    old, new = _frames(spark)
    got = {
        r["doc_id"]: r["status"]
        for r in dataset_diff(old, new, "doc_id", ["text", "lang"]).collect()
    }
    assert got[5] == "changed"  # lang en -> fr now counts
    assert got[4] == "unchanged"  # NULL == NULL under the null tag

    # NULL vs '' must be CHANGED, not equal (the null tag's job)
    a = spark.createDataFrame([(1, None)], "doc_id long, text string")
    b = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = dataset_diff(a, b, "doc_id", ["text"]).first()
    assert row["status"] == "changed"


def test_summary_counts(spark):
    from letsearch_spark.operators.diff import dataset_diff_summary

    old, new = _frames(spark)
    got = {
        r["status"]: r["n"]
        for r in dataset_diff_summary(old, new, "doc_id", ["text"]).collect()
    }
    assert got == {"unchanged": 3, "changed": 1, "removed": 1, "added": 1}


def test_compare_cols_required(spark):
    from letsearch_spark.operators.diff import dataset_diff

    old, new = _frames(spark)
    with pytest.raises(ValueError, match="compare_cols"):
        dataset_diff(old, new, "doc_id", [])


def test_join_carries_hashes_not_text(spark, sf_dir):
    """100 TB shape: the full-outer join's inputs project (key, md5)
    only -- the text column must be pruned out of both scans."""
    from letsearch_spark.operators.diff import dataset_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dataset_diff(docs, docs, "doc_id", ["text"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both scans read only doc_id + text (hash computed scan-side), and
    # the join itself is on the key with 32-char hash payloads
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"doc_id", "text"}, cols
