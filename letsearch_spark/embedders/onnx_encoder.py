"""ONNX text encoder (E1/E2 in SURVEY.md §2.4).

Reference: src/model/backends/onnx/encoder_onnx.rs. Contract reproduced:

* tokenize the batch with HF tokenizers, right-padding to the batch
  longest (encoder_onnx.rs:84-91) -- minimizes padded FLOPs;
* feed ``input_ids`` / ``attention_mask`` / optional ``token_type_ids``
  int64 tensors of shape [batch, seq] (detected from session inputs,
  encoder_onnx.rs:119-127);
* take the output named ``sentence_embedding`` -- by NAME, fixing the
  reference's introspect-by-name-then-hardcode-index-1 inconsistency
  (encoder_onnx.rs:93-131 vs :219, :289);
* output dtype f32 (f16 upcast); i8 unimplemented like the reference
  (encoder_onnx.rs:330-332).

Spark integration: :func:`embedding_udf` returns a pandas UDF whose
heavyweight state (InferenceSession + tokenizer) is created once per
executor process and cached in a module global -- the Spark analog of
the reference's shared ORT session (encoder_onnx.rs:19-54). Session
options mirror the reference: graph optimization level 3 ("all"),
intra-op threads = available cores (encoder_onnx.rs:72-79).

``onnxruntime`` / ``tokenizers`` are not in this container: every import
is lazy and guarded, and the class raises a clear RuntimeError at
construction when the backend is unavailable. Contract tests cover the
pure logic (output selection, padding shapes) with fakes.
"""

from __future__ import annotations

import os

import numpy as np

from letsearch_spark.embedders.base import Embedder

# per-process cache: model_dir -> (session, tokenizer, meta)
_SESSION_CACHE: dict[str, tuple] = {}


def pick_output(output_names: list[str]) -> int:
    """Output-selection rule (encoder_onnx.rs:93-118): prefer the output
    named 'sentence_embedding'; else index 1 when there are >1 outputs
    (models are (token_embeddings, sentence_embedding)); else 0."""
    if "sentence_embedding" in output_names:
        return output_names.index("sentence_embedding")
    return 1 if len(output_names) > 1 else 0


def needs_token_type_ids(input_names: list[str]) -> bool:
    """token_type_ids requirement detection (encoder_onnx.rs:119-127)."""
    return "token_type_ids" in input_names


def resolve_model_dir(model_uri: str, variant: str = "f32") -> str:
    """E4 URI dispatch for the ONNX path: local dir used as-is; ``hf://``
    resolved via sources.hf (downloads metadata.json + variant file)."""
    if model_uri.startswith("hf://"):
        from letsearch_spark.sources.hf import download_model

        model_dir, _ = download_model(model_uri, variant=variant)
        return model_dir
    return model_uri


class OnnxEmbedder(Embedder):
    def __init__(self, model_uri: str, variant: str = "f32", max_seq: int = 512):
        if variant == "i8":
            # parity with the reference: i8 inference is unimplemented
            # (encoder_onnx.rs:330-332)
            raise NotImplementedError("i8 variant inference is not implemented")
        self.model_uri = model_uri
        self.variant = variant
        self.max_seq = max_seq
        self._dim: int | None = None
        # fail fast if the backend is missing (driver-side), but do NOT
        # build the session here -- executors build their own lazily
        try:
            import onnxruntime  # noqa: F401
            import tokenizers  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                f"OnnxEmbedder requires onnxruntime + tokenizers: {e}"
            ) from e

    # --- lazy per-process state ---

    def _ensure(self):
        key = f"{self.model_uri}::{self.variant}"
        if key in _SESSION_CACHE:
            return _SESSION_CACHE[key]
        import onnxruntime as ort
        from tokenizers import Tokenizer

        model_dir = resolve_model_dir(self.model_uri, self.variant)
        model_file = None
        for cand in ("model.onnx", f"model_{self.variant}.onnx"):
            p = os.path.join(model_dir, cand)
            if os.path.exists(p):
                model_file = p
                break
        if model_file is None:
            raise FileNotFoundError(f"no .onnx model under {model_dir}")

        so = ort.SessionOptions()
        # reference: Level3 graph optimization, intra-op = all cores
        so.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        so.intra_op_num_threads = os.cpu_count() or 1
        session = ort.InferenceSession(model_file, so)
        tokenizer = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
        tokenizer.enable_padding(pad_id=1, pad_token="<pad>")  # encoder_onnx.rs:84-91
        tokenizer.enable_truncation(self.max_seq)

        out_names = [o.name for o in session.get_outputs()]
        in_names = [i.name for i in session.get_inputs()]
        meta = {
            "out_idx": pick_output(out_names),
            "out_name": out_names[pick_output(out_names)],
            "token_type_ids": needs_token_type_ids(in_names),
            "dim": session.get_outputs()[pick_output(out_names)].shape[-1],
        }
        _SESSION_CACHE[key] = (session, tokenizer, meta)
        return _SESSION_CACHE[key]

    def output_dim(self) -> int:
        if self._dim is None:
            self._dim = int(self._ensure()[2]["dim"])
        return self._dim

    def embed(self, texts: list[str]) -> np.ndarray:
        session, tokenizer, meta = self._ensure()
        encs = tokenizer.encode_batch([t or "" for t in texts])
        input_ids = np.array([e.ids for e in encs], dtype=np.int64)
        attention = np.array([e.attention_mask for e in encs], dtype=np.int64)
        feeds = {"input_ids": input_ids, "attention_mask": attention}
        if meta["token_type_ids"]:
            feeds["token_type_ids"] = np.zeros_like(input_ids)
        out = session.run([meta["out_name"]], feeds)[0]
        return np.asarray(out, dtype=np.float32)


def embedding_udf(model_uri: str, variant: str = "f32", dim: int | None = None):
    """Arrow-batched pandas UDF: text -> array<float> embedding.

    One ONNX session per executor process (module-global cache); Arrow
    batch size (spark.sql.execution.arrow.maxRecordsPerBatch) is the
    effective inference batch size -- replacing the reference's manual
    batch_size-32 loop (E5, collection_actor.rs:830-871)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        emb = OnnxEmbedder(model_uri, variant)
        vecs = emb.embed(s.fillna("").tolist())
        return pd.Series(list(vecs))

    return _embed
