"""Training-shard egress (operators/export.py): the distributed
prefix-sum against its single-partition-window twin, shard assignment
in both modes against SQL semantics, manifest integrity, and the
on-disk export round-trip."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from letsearch_spark.operators.export import (
    assign_shards,
    export_training_shards,
    prefix_sum,
    shard_manifest,
)


def _corpus(spark, n=200, seed_mod=37):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919 + 13) % seed_mod + 1).alias("tokens"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_prefix_sum_matches_global_window_twin(spark):
    df = _corpus(spark, 500).repartition(11)
    got = prefix_sum(df, ["doc_id"], "tokens", rank_col="rank")
    twin = df.withColumn(
        "cumsum",
        F.sum("tokens").over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).withColumn("rank", F.row_number().over(Window.orderBy("doc_id")))
    g = {r["doc_id"]: (r["cumsum"], r["rank"]) for r in got.collect()}
    t = {r["doc_id"]: (r["cumsum"], r["rank"]) for r in twin.collect()}
    assert g == t
    # descending mode
    got_d = prefix_sum(df, ["doc_id"], "tokens", ascending=False)
    twin_d = df.withColumn(
        "cumsum",
        F.sum("tokens").over(
            Window.orderBy(F.desc("doc_id")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    assert {r["doc_id"]: r["cumsum"] for r in got_d.collect()} == {
        r["doc_id"]: r["cumsum"] for r in twin_d.collect()
    }


def test_assign_shards_rows_and_tokens_modes(spark):
    df = _corpus(spark, 300).repartition(7)
    by_rows = assign_shards(df, ["doc_id"], rows_per_shard=64)
    rows = {r["doc_id"]: (r["rank"], r["shard"]) for r in by_rows.collect()}
    for did, (rank, shard) in rows.items():
        assert rank == did + 1
        assert shard == (rank - 1) // 64

    by_tok = assign_shards(
        df, ["doc_id"], tokens_per_shard=500, token_col="tokens"
    )
    data = sorted(
        (r["rank"], r["tokens"], r["shard"]) for r in by_tok.collect()
    )
    cum = 0
    for rank, tokens, shard in data:
        assert shard == cum // 500  # exclusive-prefix budget fill
        cum += tokens
    # shards hold consecutive ranks
    seen = [s for _, _, s in data]
    assert seen == sorted(seen)

    with pytest.raises(ValueError):
        assign_shards(df, ["doc_id"])
    with pytest.raises(ValueError):
        assign_shards(df, ["doc_id"], rows_per_shard=10, tokens_per_shard=10,
                      token_col="tokens")
    with pytest.raises(ValueError):
        assign_shards(df, ["doc_id"], rows_per_shard=0)
    with pytest.raises(ValueError):
        assign_shards(df, ["doc_id"], tokens_per_shard=10)  # no token_col
    bad = df.withColumn(
        "tokens", F.when(F.col("doc_id") == 5, F.lit(None)).otherwise(F.col("tokens"))
    )
    with pytest.raises(ValueError):
        assign_shards(bad, ["doc_id"], tokens_per_shard=10, token_col="tokens")


def test_shard_manifest_checksum_flips_on_any_change(spark):
    df = _corpus(spark, 100)
    a = assign_shards(df, ["doc_id"], rows_per_shard=40)
    m1 = {
        r["shard"]: (r["n_rows"], r["n_tokens"], r["checksum"])
        for r in shard_manifest(
            a, token_col="tokens", checksum_cols=["doc_id", "text"]
        ).collect()
    }
    assert [m1[s][0] for s in sorted(m1)] == [40, 40, 20]
    # same data, different physical partitioning -> identical manifest
    a2 = assign_shards(df.repartition(13), ["doc_id"], rows_per_shard=40)
    m2 = {
        r["shard"]: (r["n_rows"], r["n_tokens"], r["checksum"])
        for r in shard_manifest(
            a2, token_col="tokens", checksum_cols=["doc_id", "text"]
        ).collect()
    }
    assert m1 == m2
    # one edited row flips exactly that shard's checksum
    edited = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 50, F.lit("tampered")).otherwise(F.col("text")),
    )
    m3 = {
        r["shard"]: r["checksum"]
        for r in shard_manifest(
            assign_shards(edited, ["doc_id"], rows_per_shard=40),
            token_col="tokens",
            checksum_cols=["doc_id", "text"],
        ).collect()
    }
    assert m3[1] != m1[1][2]
    assert m3[0] == m1[0][2] and m3[2] == m1[2][2]


def test_export_training_shards_roundtrip(spark, tmp_path):
    df = _corpus(spark, 240)
    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        df,
        out,
        ["doc_id"],
        tokens_per_shard=800,
        token_col="tokens",
        checksum_cols=["doc_id", "text"],
    ).collect()
    # shard dirs on disk match the manifest
    disk = spark.read.parquet(out)
    per_shard = {
        r["shard"]: r["n"]
        for r in disk.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert {r["shard"]: r["n_rows"] for r in manifest} == per_shard
    # the manifest parquet round-trips
    m2 = spark.read.parquet(out + "_manifest")
    assert sorted(tuple(r) for r in m2.collect()) == sorted(
        tuple(r) for r in manifest
    )
    # every row came back, ranks are a permutation of 1..n
    ranks = sorted(r["rank"] for r in disk.select("rank").collect())
    assert ranks == list(range(1, 241))
    # shard token sums respect the budget fill (exclusive-prefix rule
    # means every shard STARTS within budget)
    tok = {
        r["shard"]: r["n_tokens"]
        for r in m2.collect()
    }
    assert sum(tok.values()) == sum(
        r["tokens"] for r in df.select("tokens").collect()
    )
    # a sequential read of one shard dir streams rank order
    s0 = (
        spark.read.parquet(os.path.join(out, "shard=0"))
        .select("rank")
        .collect()
    )
    assert [r["rank"] for r in s0] == sorted(r["rank"] for r in s0)


def test_verify_training_shards_catches_tampering(spark, tmp_path):
    from letsearch_spark.operators.export import verify_training_shards

    df = _corpus(spark, 120)
    out = str(tmp_path / "vshards")
    export_training_shards(
        df, out, ["doc_id"], rows_per_shard=50,
        token_col="tokens", checksum_cols=["doc_id", "text"],
    )
    report = verify_training_shards(
        spark, out, token_col="tokens", checksum_cols=["doc_id", "text"]
    )
    assert all(r["ok"] for r in report.collect())

    # delete one shard directory -> strict verify raises, report flags it
    import shutil

    shutil.rmtree(os.path.join(out, "shard=1"))
    with pytest.raises(RuntimeError, match="shard verification failed"):
        verify_training_shards(
            spark, out, token_col="tokens",
            checksum_cols=["doc_id", "text"],
        )
    rep = verify_training_shards(
        spark, out, token_col="tokens",
        checksum_cols=["doc_id", "text"], strict=False,
    )
    flags = {r["shard"]: r["ok"] for r in rep.collect()}
    assert flags[1] is False and flags[0] and flags[2]

    # wrong checksum columns -> mismatch is loud, not silent
    with pytest.raises(RuntimeError):
        verify_training_shards(
            spark, out, token_col="tokens", checksum_cols=["doc_id"]
        )


def test_cli_export_shards_roundtrip(spark, tmp_path, capsys):
    import json as _json

    from letsearch_spark.cli import build_parser

    src = str(tmp_path / "corpus.parquet")
    _corpus(spark, 90).write.parquet(src)
    out = str(tmp_path / "cli_shards")
    args = build_parser().parse_args(
        [
            "export-shards", "--input", src, "--out", out,
            "--order-by", "doc_id", "--rows-per-shard", "40",
            "--checksum-cols", "doc_id,text", "--verify",
        ]
    )
    assert args.fn(args) == 0
    lines = [
        _json.loads(l) for l in capsys.readouterr().out.splitlines() if l
    ]
    assert lines[-1] == {"verified": True}
    manifest_rows = [l for l in lines if "shard" in l]
    assert [m["n_rows"] for m in manifest_rows] == [40, 40, 10]


def test_cli_verify_shards(spark, tmp_path, capsys):
    import json as _json
    import shutil

    from letsearch_spark.cli import build_parser

    out = str(tmp_path / "vs")
    export_training_shards(
        _corpus(spark, 80), out, ["doc_id"], rows_per_shard=40,
        token_col="tokens", checksum_cols=["doc_id", "text"],
    )
    args = build_parser().parse_args(
        [
            "verify-shards", "--path", out,
            "--token-col", "tokens", "--checksum-cols", "doc_id,text",
        ]
    )
    assert args.fn(args) == 0
    assert _json.loads(capsys.readouterr().out.splitlines()[-1]) == {
        "verified": True, "shards": 2,
    }
    shutil.rmtree(os.path.join(out, "shard=1"))
    assert args.fn(args) == 1
    last = _json.loads(capsys.readouterr().out.splitlines()[-1])
    assert last["verified"] is False


def test_cli_verify_shards_bad_path_keeps_json_contract(spark, tmp_path, capsys):
    """Review r7: ANY failure (missing path, wrong options) must emit
    the JSON {verified: false} line and exit 1, never a raw traceback."""
    import json as _json

    from letsearch_spark.cli import build_parser

    args = build_parser().parse_args(
        ["verify-shards", "--path", str(tmp_path / "nope")]
    )
    assert args.fn(args) == 1
    last = _json.loads(capsys.readouterr().out.splitlines()[-1])
    assert last["verified"] is False and last["error"]


def test_export_verify_jsonl_format(spark, tmp_path):
    """data_format='jsonl' (r10): the trainer interchange format rides
    the same shard=N layout, manifest and verify contract -- strict
    verify passes on the intact layout, a deleted shard raises, and a
    bad format name raises up front."""
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from letsearch_spark.operators.export import (
        export_training_shards,
        verify_training_shards,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        (F.col("id") % 7 + 1).alias("tokens"),
    )
    out = str(tmp_path / "jl_shards")
    manifest = export_training_shards(
        df,
        out,
        ["doc_id"],
        rows_per_shard=50,
        token_col="tokens",
        checksum_cols=["doc_id", "text"],
        data_format="jsonl",
    )
    shards = [r["shard"] for r in manifest.collect()]
    assert len(shards) == 4
    # the data really is line-delimited JSON
    import glob
    import json as _json

    files = glob.glob(f"{out}/shard=0/*.json")
    assert files
    with open(files[0]) as f:
        first = _json.loads(f.readline())
    assert "doc_id" in first and "text" in first

    report = verify_training_shards(
        spark,
        out,
        token_col="tokens",
        checksum_cols=["doc_id", "text"],
        data_format="jsonl",
    )
    assert all(r["ok"] for r in report.collect())

    shutil.rmtree(f"{out}/shard=2")
    with pytest.raises(RuntimeError, match="verification failed"):
        verify_training_shards(
            spark,
            out,
            token_col="tokens",
            checksum_cols=["doc_id", "text"],
            data_format="jsonl",
        )

    with pytest.raises(ValueError, match="parquet' or 'jsonl"):
        export_training_shards(
            df, str(tmp_path / "x"), ["doc_id"], rows_per_shard=50,
            data_format="csv",
        )
