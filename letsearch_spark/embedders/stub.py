"""Deterministic stub embedder (FIXTURES.md §3) -- no model downloads.

``v[j] = float((murmur3_32(token) >> j) & 0xFF) / 255`` summed over
whitespace tokens, then L2-normalized; empty text -> zero vector.
The murmur3 is a self-contained pure-Python MurmurHash3 x86 32-bit
(seed 0) so the value is identical on every executor and every process,
which is what makes end-to-end pipeline tests hash-stable.
"""

from __future__ import annotations

import numpy as np

from letsearch_spark.embedders.base import Embedder


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit, standard public algorithm."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    n_blocks = length // 4
    for i in range(n_blocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n_blocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


class StubEmbedder(Embedder):
    def __init__(self, dim: int = 16):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def output_dim(self) -> int:
        return self.dim

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            h = murmur3_32(token.encode("utf-8"))
            v = np.array(
                [((h >> j) & 0xFF) / 255.0 for j in range(self.dim)],
                dtype=np.float64,
            )
            if len(self._cache) < 1_000_000:
                self._cache[token] = v
        return v

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            tokens = (text or "").split()
            if not tokens:
                continue
            acc = np.zeros(self.dim, dtype=np.float64)
            for t in tokens:
                acc += self._token_vec(t)
            n = np.linalg.norm(acc)
            if n > 0:
                acc /= n
            out[i] = acc
        return out.astype(np.float32)
