"""Gemini batchEmbedContents embedder (E3 in SURVEY.md §2.4).

Reference: src/model/backends/gemini/gemini_embedder.rs. Request shape
reproduced exactly (gemini_embedder.rs:88-119):

    POST {base}/{model}:batchEmbedContents?key={api_key}
    {"requests": [{"model": "models/<model>",
                   "content": {"parts": [{"text": "..."}]},
                   "output_dimensionality": <dim>}, ...]}

Constants mirror gemini_embedder.rs:7-11: default dim 3072, valid range
256..=3072, f32 only. Each returned embedding's length is validated
against the declared dim (gemini_embedder.rs:126-139).

Network access is injected (``transport`` callable) so the contract is
testable offline; the default transport uses urllib from the Python
standard library with bounded retries. In Spark this embedder runs
inside the same mapInPandas pipeline as the ONNX one -- per-executor
client, batched requests, so N executors give N-way request parallelism
(rate limits permitting).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

import numpy as np

from letsearch_spark.embedders.base import Embedder

DEFAULT_BASE_URL = "https://generativelanguage.googleapis.com/v1beta/models"
DEFAULT_DIM = 3072
MIN_DIM, MAX_DIM = 256, 3072


def _default_transport(url: str, payload: dict, retries: int = 3) -> dict:
    body = json.dumps(payload).encode("utf-8")
    last: Exception | None = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except Exception as e:  # bounded retry with backoff
            last = e
            time.sleep(2**attempt)
    raise RuntimeError(f"Gemini request failed after {retries} attempts: {last}")


class GeminiEmbedder(Embedder):
    def __init__(
        self,
        model: str = "gemini-embedding-001",
        dim: int = DEFAULT_DIM,
        api_key: str | None = None,
        base_url: str = DEFAULT_BASE_URL,
        transport=None,
    ):
        if not MIN_DIM <= dim <= MAX_DIM:
            # gemini_embedder.rs:30-36 validation
            raise ValueError(f"dim must be in [{MIN_DIM}, {MAX_DIM}], got {dim}")
        self.model = model
        self.dim = dim
        self.api_key = api_key or os.environ.get("GEMINI_API_KEY", "")
        self.base_url = base_url
        self.transport = transport or _default_transport

    def output_dim(self) -> int:
        return self.dim

    def build_payload(self, texts: list[str]) -> dict:
        """One EmbedRequest per text (gemini_embedder.rs:88-105)."""
        return {
            "requests": [
                {
                    "model": f"models/{self.model}",
                    "content": {"parts": [{"text": t}]},
                    "output_dimensionality": self.dim,
                }
                for t in texts
            ]
        }

    def embed(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        url = f"{self.base_url}/{self.model}:batchEmbedContents?key={self.api_key}"
        data = self.transport(url, self.build_payload(texts))
        embs = data.get("embeddings", [])
        if len(embs) != len(texts):
            raise RuntimeError(
                f"expected {len(texts)} embeddings, got {len(embs)}"
            )
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, e in enumerate(embs):
            vals = e.get("values", [])
            if len(vals) != self.dim:
                # per-item dim validation (gemini_embedder.rs:126-139)
                raise RuntimeError(
                    f"embedding {i} has dim {len(vals)}, expected {self.dim}"
                )
            out[i] = vals
        return out
