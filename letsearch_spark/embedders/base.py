"""Embedder protocol (reference: Embedder trait, model_utils.rs:26-31).

``output_dim`` / ``output_dtype`` / ``embed(texts) -> 2-D float array``.
Embedders must be picklable (or cheaply re-constructible) because they are
shipped to executors inside a pandas UDF closure; heavyweight state
(ONNX sessions, HTTP clients) is created lazily per-process.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class Embedder(ABC):
    @abstractmethod
    def output_dim(self) -> int: ...

    def output_dtype(self) -> str:
        return "f32"

    @abstractmethod
    def embed(self, texts: list[str]) -> np.ndarray:
        """Return float32 array of shape (len(texts), output_dim)."""
