"""Contract tests for embedders (E1-E4), hf:// resolution (S7/S8),
multimodal plumbing, and the Gemini request shape (E3) -- all offline.
"""

import json

import numpy as np
import pytest

from letsearch_spark.embedders import get_embedder
from letsearch_spark.embedders.gemini import GeminiEmbedder
from letsearch_spark.embedders.onnx_encoder import needs_token_type_ids, pick_output
from letsearch_spark.embedders.stub import StubEmbedder
from letsearch_spark.sources import hf


# ---- E4 URI dispatch ----


def test_get_embedder_stub_uri():
    e = get_embedder("stub://32")
    assert isinstance(e, StubEmbedder)
    assert e.output_dim() == 32
    assert get_embedder("stub://").output_dim() == 16  # default dim


def test_get_embedder_gemini_uri():
    e = get_embedder("gemini://gemini-embedding-001", dim=256, api_key="k")
    assert isinstance(e, GeminiEmbedder)
    assert e.model == "gemini-embedding-001"
    assert e.output_dim() == 256


def test_get_embedder_onnx_requires_backend():
    # container has no onnxruntime: the ONNX path must fail loudly and
    # early, not at executor time
    with pytest.raises((RuntimeError, NotImplementedError)):
        get_embedder("hf://mys/minilm")


# ---- E2 ONNX introspection rules ----


def test_pick_output_by_name():
    assert pick_output(["token_embeddings", "sentence_embedding"]) == 1
    assert pick_output(["sentence_embedding", "other"]) == 0
    # no name match: index 1 when >1 outputs (reference convention), else 0
    assert pick_output(["a", "b"]) == 1
    assert pick_output(["only"]) == 0


def test_token_type_ids_detection():
    assert needs_token_type_ids(["input_ids", "attention_mask", "token_type_ids"])
    assert not needs_token_type_ids(["input_ids", "attention_mask"])


# ---- E3 Gemini contract ----


def test_gemini_payload_shape():
    g = GeminiEmbedder(model="m", dim=256, api_key="k")
    p = g.build_payload(["hello", "world"])
    assert p == {
        "requests": [
            {
                "model": "models/m",
                "content": {"parts": [{"text": "hello"}]},
                "output_dimensionality": 256,
            },
            {
                "model": "models/m",
                "content": {"parts": [{"text": "world"}]},
                "output_dimensionality": 256,
            },
        ]
    }


def test_gemini_dim_validation():
    with pytest.raises(ValueError):
        GeminiEmbedder(dim=100)  # < 256
    with pytest.raises(ValueError):
        GeminiEmbedder(dim=4000)  # > 3072


def test_gemini_embed_roundtrip_and_dim_check():
    calls = []

    def transport(url, payload):
        calls.append((url, payload))
        n = len(payload["requests"])
        return {"embeddings": [{"values": [0.5] * 256} for _ in range(n)]}

    g = GeminiEmbedder(model="m", dim=256, api_key="secret", transport=transport)
    out = g.embed(["a", "b"])
    assert out.shape == (2, 256) and out.dtype == np.float32
    assert "m:batchEmbedContents?key=secret" in calls[0][0]

    def bad_transport(url, payload):
        return {"embeddings": [{"values": [0.5] * 10}]}

    g2 = GeminiEmbedder(model="m", dim=256, transport=bad_transport)
    with pytest.raises(RuntimeError):
        g2.embed(["a"])


# ---- S7/S8 hf:// contract ----


def test_parse_hf_uri():
    assert hf.parse_hf_uri("hf://mys/minilm") == "mys/minilm"
    for bad in ("mys/minilm", "hf://justone", "hf://a/b/c"):
        with pytest.raises(ValueError):
            hf.parse_hf_uri(bad)


def test_dataset_url_mapping():
    assert (
        hf.dataset_url("hf://datasets/org/name/data/part-0.parquet")
        == "https://huggingface.co/datasets/org/name/resolve/main/data/part-0.parquet"
    )


def test_metadata_contract():
    meta = {
        "letsearch_version": 1,
        "variants": [{"variant": "f32", "path": "model.onnx"}],
        "required_files": ["tokenizer.json"],
    }
    hf.validate_metadata(meta)
    assert hf.pick_variant(meta, "f32") == "model.onnx"
    with pytest.raises(ValueError):
        hf.pick_variant(meta, "i8")
    with pytest.raises(ValueError):
        hf.validate_metadata({"letsearch_version": 2, "variants": [{}]})


def test_download_model_with_fake_fetch(tmp_path, monkeypatch):
    monkeypatch.setenv("LETSEARCH_SPARK_HOME", str(tmp_path))
    meta = {
        "letsearch_version": 1,
        "variants": [{"variant": "f32", "path": "model.onnx"}],
        "required_files": ["tokenizer.json"],
    }
    fetched = []

    def fetch(url):
        fetched.append(url)
        if url.endswith("metadata.json"):
            return json.dumps(meta).encode()
        return b"FAKE:" + url.encode()

    model_dir, model_file = hf.download_model("hf://org/repo", "f32", fetch=fetch)
    assert model_file.endswith("model.onnx")
    assert (tmp_path / "models/org/repo/tokenizer.json").exists()
    # second call: everything cached, no fetches
    fetched.clear()
    hf.download_model("hf://org/repo", "f32", fetch=fetch)
    assert fetched == []


def test_list_models_sorted_by_downloads():
    def fetch(url):
        assert "filter=letsearch" in url
        return json.dumps(
            [{"id": "a", "downloads": 5}, {"id": "b", "downloads": 50}]
        ).encode()

    out = hf.list_models(fetch=fetch)
    assert [m["id"] for m in out] == ["b", "a"]


def test_resolve_data_path(tmp_path, monkeypatch):
    monkeypatch.setenv("LETSEARCH_SPARK_HOME", str(tmp_path))
    assert hf.resolve_data_path("/local/file.parquet") == "/local/file.parquet"
    assert hf.resolve_data_path("data/*.parquet") == "data/*.parquet"

    payload = open("/root/testdata/sf0.001/region.parquet", "rb").read()
    calls = []

    def fetch(url):
        calls.append(url)
        assert url == (
            "https://huggingface.co/datasets/org/name/resolve/main/region.parquet"
        )
        return payload

    p = hf.resolve_data_path("hf://datasets/org/name/region.parquet", fetch=fetch)
    assert open(p, "rb").read() == payload
    # second resolve: cached, no fetch
    calls.clear()
    assert hf.resolve_data_path("hf://datasets/org/name/region.parquet", fetch=fetch) == p
    assert calls == []


def test_hf_dataset_ingest_end_to_end(spark, tmp_path, monkeypatch):
    """S1/S2 hf:// data path: collection ingest through the resolver."""
    monkeypatch.setenv("LETSEARCH_SPARK_HOME", str(tmp_path))
    payload = open("/root/testdata/sf0.001/documents.parquet", "rb").read()
    monkeypatch.setattr(hf, "_default_fetch", lambda url: payload)

    from letsearch_spark.collection import Collection

    c = Collection.create(
        spark, str(tmp_path / "root"), name="hfdata",
        index_columns=["text"], model_name="stub://16",
    )
    n = c.import_parquet("hf://datasets/org/name/documents.parquet")
    assert n == 500
    assert "_key" in c.docs().columns


# ---- multimodal plumbing ----


def test_frame_sample_plan_matches_pdf_heuristic_policy():
    from letsearch_spark.sources.multimodal import frame_sample_plan

    assert frame_sample_plan(0, 3) == []
    assert frame_sample_plan(1, 3) == [0]
    # 4 frames, 2 samples -> step 2 -> frames 0, 2 (same as PDF pages)
    assert frame_sample_plan(4, 2) == [0, 2]
    assert frame_sample_plan(10, 3) == [0, 3, 6]


def test_decode_media_fake_and_none(spark, tmp_path):
    from letsearch_spark.sources.multimodal import decode_media, read_media

    for i in range(3):
        (tmp_path / f"img{i}.bin").write_bytes(bytes([i]) * (100 + i))
    df = read_media(spark, str(tmp_path / "*.bin"))
    out = decode_media(df, decoder="fake").orderBy("path").collect()
    assert len(out) == 3
    assert out[0]["n_bytes"] == 100
    assert len(out[0]["media_sha"]) == 64
    assert len(out[0]["feature"]) == 4
    # determinism
    out2 = decode_media(df, decoder="fake").orderBy("path").collect()
    assert [r["media_sha"] for r in out] == [r["media_sha"] for r in out2]
    assert [r["width"] for r in out] == [r["width"] for r in out2]

    from py4j.protocol import Py4JJavaError

    with pytest.raises((NotImplementedError, Py4JJavaError, Exception)):
        decode_media(df, decoder="none").collect()
