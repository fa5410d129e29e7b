"""Embedder registry + URI dispatch (E4 in SURVEY.md §2.4).

The reference routes model URIs in ModelManager::LoadModel
(model_actor.rs:58-111): ``gemini://`` -> Gemini REST embedder,
``hf://`` -> download then ONNX, anything else -> local ONNX files.
We add ``stub://`` for the deterministic no-download embedder used by
tests/CI (FIXTURES.md §3).
"""

from __future__ import annotations

from letsearch_spark.embedders.base import Embedder
from letsearch_spark.embedders.stub import StubEmbedder

__all__ = ["Embedder", "StubEmbedder", "get_embedder"]


def get_embedder(model_uri: str, variant: str = "f32", **kwargs) -> Embedder:
    """Resolve a model URI to an Embedder (reference: model_actor.rs:58-111)."""
    if model_uri.startswith("stub://"):
        dim = int(model_uri.removeprefix("stub://") or "16")
        return StubEmbedder(dim=dim)
    if model_uri.startswith("gemini://"):
        from letsearch_spark.embedders.gemini import GeminiEmbedder

        return GeminiEmbedder(model=model_uri.removeprefix("gemini://"), **kwargs)
    # hf:// download or local directory -> ONNX session
    from letsearch_spark.embedders.onnx_encoder import OnnxEmbedder

    return OnnxEmbedder(model_uri, variant=variant, **kwargs)
