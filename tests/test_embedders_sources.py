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


def test_parse_image_header_golden_roundtrip():
    """r10 (VERDICT r9 next #3): the stdlib header parser reads back
    exactly what the fixture builder wrote for every format, across
    dimension edge cases, with and without trailing payload bytes."""
    from letsearch_spark.sources.multimodal import (
        build_image_bytes,
        parse_image_header,
    )

    for fmt, w, h in [
        ("png", 1, 1),
        ("png", 65536, 3),  # >u16: PNG dims are u32
        ("gif", 640, 480),
        ("gif", 65535, 1),
        ("jpeg", 1920, 1080),
        ("jpeg", 65535, 65535),
        ("webp", 2, 2),
        ("webp", 16384, 16384),  # VP8X canvas is 24-bit
    ]:
        for pad in (0, 37):
            data = build_image_bytes(fmt, w, h, pad=pad)
            assert parse_image_header(data) == (fmt, w, h), (fmt, w, h, pad)

    # hand-built WebP lossy (VP8) and lossless (VP8L) variants the
    # builder doesn't emit
    import struct

    vp8_payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    vp8 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8_payload)) + b"WEBP"
        b"VP8 " + struct.pack("<I", len(vp8_payload)) + vp8_payload
    )
    assert parse_image_header(vp8) == ("webp", 320, 240)

    bits = (100 - 1) | ((200 - 1) << 14)
    vp8l_payload = b"\x2f" + struct.pack("<I", bits)
    vp8l = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8l_payload)) + b"WEBP"
        b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    )
    assert parse_image_header(vp8l) == ("webp", 100, 200)


def test_parse_image_header_malformed_degrades_to_null():
    """Corrupt/truncated/foreign bytes yield (None, None, None), never
    an exception -- including every prefix of each valid fixture (the
    truncation sweep) and dimension-zero headers."""
    import struct

    from letsearch_spark.sources.multimodal import (
        _PNG_SIG,
        build_image_bytes,
        parse_image_header,
    )

    null = (None, None, None)
    assert parse_image_header(b"") == null
    assert parse_image_header(b"plain text, not an image") == null
    assert parse_image_header(_PNG_SIG) == null  # sig only
    # PNG whose first chunk is not IHDR
    bad_png = _PNG_SIG + struct.pack(">I", 13) + b"gAMA" + b"\x00" * 13
    assert parse_image_header(bad_png) == null
    # zero-dimension PNG/GIF
    zp = bytearray(build_image_bytes("png", 1, 1))
    zp[16:20] = b"\x00\x00\x00\x00"
    assert parse_image_header(bytes(zp)) == null
    zg = bytearray(build_image_bytes("gif", 1, 1))
    zg[6:8] = b"\x00\x00"
    assert parse_image_header(bytes(zg)) == null
    # JPEG that hits SOS/EOI before any SOF, and a bare SOI
    assert parse_image_header(b"\xff\xd8\xff\xd9") == null
    assert parse_image_header(b"\xff\xd8") == null
    # JPEG with a non-marker byte where a marker must be
    assert parse_image_header(b"\xff\xd8\x00\x00\x00\x00") == null
    # WebP with an unknown first chunk / bad VP8 start code
    unk = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"ZZZZ" + b"\x00" * 8
    assert parse_image_header(unk) == null
    vp8_bad = (
        b"RIFF" + struct.pack("<I", 20) + b"WEBP"
        b"VP8 " + struct.pack("<I", 10)
        + b"\x00\x00\x00" + b"\xff\xff\xff" + b"\x00\x00\x00\x00"
    )
    assert parse_image_header(vp8_bad) == null
    # truncation sweep: every strict prefix parses to a clean null or
    # the full answer (short JPEGs can legitimately resolve early once
    # the SOF segment is in), never raises
    for fmt in ("png", "gif", "jpeg", "webp"):
        data = build_image_bytes(fmt, 33, 44)
        want = (fmt, 33, 44)
        for cut in range(len(data)):
            got = parse_image_header(data[:cut])
            assert got == null or got == want, (fmt, cut, got)


def test_decode_media_headers_spark_end_to_end(spark):
    """decoder='headers' through the mapInPandas kernel: real parsed
    dims for valid payloads, null format/dims for the malformed row,
    n_bytes/sha always real; decode_media dispatches the mode."""
    import hashlib

    from letsearch_spark.sources.multimodal import (
        build_image_bytes,
        decode_media,
    )

    payloads = {
        "a.png": build_image_bytes("png", 12, 34, pad=5),
        "b.gif": build_image_bytes("gif", 56, 78),
        "c.jpg": build_image_bytes("jpeg", 90, 11, pad=3),
        "d.webp": build_image_bytes("webp", 22, 33),
        "e.bin": b"not an image at all",
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in sorted(payloads.items())],
        "path string, content binary",
    ).repartition(3)
    rows = {
        r["path"]: r
        for r in decode_media(df, decoder="headers").collect()
    }
    assert rows["a.png"]["format"] == "png"
    assert (rows["a.png"]["width"], rows["a.png"]["height"]) == (12, 34)
    assert rows["b.gif"]["format"] == "gif"
    assert (rows["c.jpg"]["width"], rows["c.jpg"]["height"]) == (90, 11)
    assert rows["d.webp"]["format"] == "webp"
    assert rows["e.bin"]["format"] is None
    assert rows["e.bin"]["width"] is None and rows["e.bin"]["height"] is None
    for k, v in payloads.items():
        assert rows[k]["n_bytes"] == len(v)
        assert rows[k]["media_sha"] == hashlib.sha256(v).hexdigest()

    # a NULL payload is an all-null row, never a task crash (the 100 TB
    # contract; r10 review catch) -- in both decode modes
    ndf = spark.createDataFrame(
        [("f.null", None), ("a.png", bytearray(payloads["a.png"]))],
        "path string, content binary",
    )
    nrows = {
        r["path"]: r for r in decode_media(ndf, decoder="headers").collect()
    }
    assert nrows["f.null"]["n_bytes"] is None
    assert nrows["f.null"]["media_sha"] is None
    assert nrows["f.null"]["format"] is None
    assert nrows["a.png"]["format"] == "png"
    frows = {
        r["path"]: r for r in decode_media(ndf, decoder="fake").collect()
    }
    assert frows["f.null"]["width"] is None and frows["f.null"]["feature"] is None
    assert frows["a.png"]["width"] is not None
