"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star operators (BASELINE.json): at 100 TB, media lives as binary
payloads in parquet (or as paths into object storage) beside typed
metadata columns; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas UDFs over ``mapInPandas`` so bytes never leave
the executor that read them.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed two ways, clearly marked:

* ``decoder="none"`` raises NotImplementedError at first batch -- the
  honest stub for production wiring;
* ``decoder="fake"`` derives a deterministic pseudo-decode from the
  bytes (md5-seeded) -- keeps the full Spark plumbing (schema,
  partitioning, UDF signature, Arrow batch shape) real and testable.

Everything around the kernel -- binaryFile scan, metadata extraction,
batch iteration, schema -- is production code.
"""

from __future__ import annotations

import hashlib

MEDIA_SCHEMA = (
    "path string, n_bytes long, media_sha string, "
    "width int, height int, n_channels int, feature array<float>"
)


def read_media(spark, path_glob: str):
    """binaryFile scan: (path, modificationTime, length, content).
    Files split across executors; predicate pushdown applies to
    path/length metadata (e.g. .filter("length < 10485760"))."""
    return spark.read.format("binaryFile").load(path_glob)


def _fake_decode(data: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decode: md5-seeded dims and a
    4-dim feature. STUB -- replace with PIL/ffmpeg in production."""
    h = hashlib.md5(data).digest()
    width = 16 + h[0]
    height = 16 + h[1]
    channels = 1 + (h[2] % 4)
    feature = [b / 255.0 for b in h[3:7]]
    return width, height, channels, feature


def decode_media(df, decoder: str = "fake", content_col: str = "content"):
    """Decode/feature-extract media bytes distributively.

    Returns (path, n_bytes, media_sha, width, height, n_channels,
    feature). The sha + byte length are always real; dims/features come
    from the selected decode kernel.
    """
    import pandas as pd

    if decoder not in ("fake", "none"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf[content_col]):
                data = bytes(content)
                if decoder == "none":
                    raise NotImplementedError(
                        "media decode requires an image/audio backend "
                        "(PIL/ffmpeg) not present in this environment"
                    )
                w, h, c, feat = _fake_decode(data)
                rows.append(
                    (
                        path,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        w,
                        h,
                        c,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "n_bytes",
                    "media_sha",
                    "width",
                    "height",
                    "n_channels",
                    "feature",
                ],
            )

    return df.select("path", content_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(n_frames: int, sample_count: int) -> list[int]:
    """Evenly-spaced frame sampling indices -- the same sqrt-style policy
    the reference applies to PDF pages (pdf.rs:25-33): ``step = max(n //
    samples, 1)``, clamped to the last frame."""
    if n_frames <= 0:
        return []
    sample_count = min(max(sample_count, 1), n_frames)
    step = max(n_frames // sample_count, 1)
    return [min(i * step, n_frames - 1) for i in range(sample_count)]
