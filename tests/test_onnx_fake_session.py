"""Offline drive of the ONNX encode path (E1) with a fake backend.

``onnxruntime``/``tokenizers`` are absent from this container, so the
real ``OnnxEmbedder._ensure``/``embed`` code (tensor prep, output
selection, f16 upcast -- reference encoder_onnx.rs:84-91,119-127,
163-301) is exercised by injecting fake modules into ``sys.modules``:

* FakeTokenizer: whitespace tokenizer that mimics HF tokenizers'
  documented enable_padding behavior (right-pad to the batch longest
  with pad_id) and refuses to encode before padding is configured;
* FakeInferenceSession: records every ``run`` feed, serves configurable
  input/output names, returns a float16 array so the upcast is
  observable.

Only the backend is faked; every assertion targets the production code
in letsearch_spark/embedders/onnx_encoder.py.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest


class FakeEncoding:
    def __init__(self, ids, attention_mask):
        self.ids = ids
        self.attention_mask = attention_mask


class FakeTokenizer:
    """Whitespace tokenizer; token id = len(word). Pads like HF
    tokenizers: right-pad every encoding to the batch longest."""

    from_file_paths: list[str] = []

    def __init__(self, path):
        self.path = path
        self.pad_id = None
        self.pad_token = None
        self.truncation = None

    @classmethod
    def from_file(cls, path):
        cls.from_file_paths.append(path)
        return cls(path)

    def enable_padding(self, pad_id=0, pad_token="[PAD]"):
        self.pad_id = pad_id
        self.pad_token = pad_token

    def enable_truncation(self, max_length):
        self.truncation = max_length

    def encode_batch(self, texts):
        if self.pad_id is None:
            raise AssertionError("encode_batch called before enable_padding")
        raw = [[len(w) for w in t.split()] for t in texts]
        if self.truncation is not None:
            raw = [ids[: self.truncation] for ids in raw]
        longest = max((len(ids) for ids in raw), default=0)
        out = []
        for ids in raw:
            n_pad = longest - len(ids)
            out.append(
                FakeEncoding(
                    ids + [self.pad_id] * n_pad,
                    [1] * len(ids) + [0] * n_pad,
                )
            )
        return out


class FakeNodeArg:
    def __init__(self, name, shape):
        self.name = name
        self.shape = shape


class FakeInferenceSession:
    """Configured through class attributes set by each test."""

    input_names = ["input_ids", "attention_mask"]
    output_names = ["token_embeddings", "sentence_embedding"]
    dim = 8
    out_dtype = np.float16
    instances: list["FakeInferenceSession"] = []

    def __init__(self, model_path, sess_options=None):
        self.model_path = model_path
        self.sess_options = sess_options
        self.run_calls: list[tuple[list[str], dict]] = []
        type(self).instances.append(self)

    def get_inputs(self):
        return [FakeNodeArg(n, ["batch", "seq"]) for n in self.input_names]

    def get_outputs(self):
        shapes = {
            "token_embeddings": ["batch", "seq", self.dim],
            "sentence_embedding": ["batch", self.dim],
        }
        return [
            FakeNodeArg(n, shapes.get(n, ["batch", self.dim]))
            for n in self.output_names
        ]

    def run(self, output_names, feeds):
        self.run_calls.append((list(output_names), dict(feeds)))
        batch = feeds["input_ids"].shape[0]
        # deterministic: row i = (mean of its ids) + column index
        base = feeds["input_ids"].astype(np.float64).mean(axis=1, keepdims=True)
        sent = (base + np.arange(self.dim)).astype(self.out_dtype)
        results = []
        for name in output_names:
            if name == "token_embeddings":
                seq = feeds["input_ids"].shape[1]
                results.append(
                    np.zeros((batch, seq, self.dim), dtype=self.out_dtype)
                )
            else:
                results.append(sent)
        return results


@pytest.fixture
def fake_backend(tmp_path, monkeypatch):
    """Install fake onnxruntime/tokenizers modules and a model dir."""
    ort = types.ModuleType("onnxruntime")

    class SessionOptions:
        pass

    class GraphOptimizationLevel:
        ORT_ENABLE_ALL = "ORT_ENABLE_ALL"
        ORT_ENABLE_BASIC = "ORT_ENABLE_BASIC"

    ort.SessionOptions = SessionOptions
    ort.GraphOptimizationLevel = GraphOptimizationLevel
    ort.InferenceSession = FakeInferenceSession

    tok = types.ModuleType("tokenizers")
    tok.Tokenizer = FakeTokenizer

    monkeypatch.setitem(sys.modules, "onnxruntime", ort)
    monkeypatch.setitem(sys.modules, "tokenizers", tok)

    from letsearch_spark.embedders import onnx_encoder

    monkeypatch.setattr(onnx_encoder, "_SESSION_CACHE", {})
    FakeInferenceSession.instances = []
    FakeInferenceSession.input_names = ["input_ids", "attention_mask"]
    FakeInferenceSession.output_names = ["token_embeddings", "sentence_embedding"]
    FakeInferenceSession.out_dtype = np.float16
    FakeTokenizer.from_file_paths = []

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "model.onnx").write_bytes(b"fake")
    (model_dir / "tokenizer.json").write_text("{}")
    return str(model_dir)


def _embedder(model_dir, **kw):
    from letsearch_spark.embedders.onnx_encoder import OnnxEmbedder

    return OnnxEmbedder(model_dir, **kw)


def test_feeds_are_right_padded_i64(fake_backend):
    emb = _embedder(fake_backend)
    out = emb.embed(["one two three four", "one", ""])
    session = FakeInferenceSession.instances[0]
    (names, feeds), = session.run_calls

    ids = feeds["input_ids"]
    mask = feeds["attention_mask"]
    # i64 tensors of shape [batch, longest] (encoder_onnx.rs:163-301)
    assert ids.dtype == np.int64 and mask.dtype == np.int64
    assert ids.shape == (3, 4) and mask.shape == (3, 4)
    # right-padding to the batch longest with pad_id=1 (encoder_onnx.rs:84-91)
    assert ids[0].tolist() == [3, 3, 5, 4]
    assert ids[1].tolist() == [3, 1, 1, 1]
    assert ids[2].tolist() == [1, 1, 1, 1]
    assert mask[0].tolist() == [1, 1, 1, 1]
    assert mask[1].tolist() == [1, 0, 0, 0]
    assert mask[2].tolist() == [0, 0, 0, 0]
    assert out.shape == (3, FakeInferenceSession.dim)


def test_token_type_ids_included_only_when_model_wants_them(fake_backend):
    FakeInferenceSession.input_names = [
        "input_ids", "attention_mask", "token_type_ids",
    ]
    emb = _embedder(fake_backend)
    emb.embed(["a b", "c"])
    (_, feeds), = FakeInferenceSession.instances[0].run_calls
    # zeros_like(input_ids): i64, same shape (encoder_onnx.rs:119-127)
    tt = feeds["token_type_ids"]
    assert tt.dtype == np.int64
    assert tt.shape == feeds["input_ids"].shape
    assert not tt.any()


def test_token_type_ids_excluded_when_model_lacks_them(fake_backend):
    emb = _embedder(fake_backend)
    emb.embed(["a b"])
    (_, feeds), = FakeInferenceSession.instances[0].run_calls
    assert "token_type_ids" not in feeds


def test_output_picked_by_name_and_f16_upcast(fake_backend):
    # sentence_embedding NOT at index 1: the by-name rule must find it
    FakeInferenceSession.output_names = ["sentence_embedding", "other_a", "other_b"]
    emb = _embedder(fake_backend)
    out = emb.embed(["x y z"])
    (names, feeds), = FakeInferenceSession.instances[0].run_calls
    # run() is asked for exactly the named output (encoder_onnx.rs:93-131)
    assert names == ["sentence_embedding"]
    # fake returns float16; embed() must upcast to f32 (encoder_onnx.rs:289)
    assert out.dtype == np.float32
    expected = (np.float64(1.0) + np.arange(8)).astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(out[0], expected)


def test_output_dim_from_session_metadata(fake_backend):
    emb = _embedder(fake_backend)
    assert emb.output_dim() == FakeInferenceSession.dim


def test_session_options_and_tokenizer_config(fake_backend):
    emb = _embedder(fake_backend, max_seq=16)
    emb.embed(["hello world"])
    session = FakeInferenceSession.instances[0]
    # reference: Level3 ("all") graph optimization, intra-op = all cores
    # (encoder_onnx.rs:72-79)
    assert session.sess_options.graph_optimization_level == "ORT_ENABLE_ALL"
    assert session.sess_options.intra_op_num_threads == (os.cpu_count() or 1)
    assert session.model_path == os.path.join(fake_backend, "model.onnx")
    assert FakeTokenizer.from_file_paths == [
        os.path.join(fake_backend, "tokenizer.json")
    ]


def test_truncation_to_max_seq(fake_backend):
    emb = _embedder(fake_backend, max_seq=2)
    emb.embed(["a bb ccc dddd"])
    (_, feeds), = FakeInferenceSession.instances[0].run_calls
    assert feeds["input_ids"].shape == (1, 2)
    assert feeds["input_ids"][0].tolist() == [1, 2]


def test_session_cached_per_model_and_variant(fake_backend):
    emb = _embedder(fake_backend)
    emb.embed(["a"])
    emb.embed(["b"])
    assert len(FakeInferenceSession.instances) == 1  # shared session
    # a second embedder for the same model reuses the cache too
    emb2 = _embedder(fake_backend)
    emb2.embed(["c"])
    assert len(FakeInferenceSession.instances) == 1


def test_variant_model_file_fallback(fake_backend, tmp_path):
    # only model_f16.onnx present -> the f16 variant must find it
    model_dir = tmp_path / "m16"
    model_dir.mkdir()
    (model_dir / "model_f16.onnx").write_bytes(b"fake")
    (model_dir / "tokenizer.json").write_text("{}")
    emb = _embedder(str(model_dir), variant="f16")
    emb.embed(["a"])
    assert FakeInferenceSession.instances[0].model_path == str(
        model_dir / "model_f16.onnx"
    )


def test_i8_variant_unimplemented(fake_backend):
    from letsearch_spark.embedders.onnx_encoder import OnnxEmbedder

    with pytest.raises(NotImplementedError):
        OnnxEmbedder(fake_backend, variant="i8")


def test_none_texts_coalesce_to_empty(fake_backend):
    emb = _embedder(fake_backend)
    out = emb.embed([None, "a"])
    (_, feeds), = FakeInferenceSession.instances[0].run_calls
    # None -> "" -> zero real tokens, fully padded + masked out
    assert feeds["attention_mask"][0].tolist() == [0]
    assert out.shape == (2, FakeInferenceSession.dim)
