"""Quantized vector storage: f16 / int8 variants (SURVEY.md §1.2).

The reference stores vectors at usearch ScalarKind F32/F16/I8 mapped
from the model variant (collection_actor.rs:793-797). Spark has no
native f16/int8 array type, so quantized vectors are packed into a
``binary`` column and decoded with Catalyst-expression-free pandas UDFs
only at the (rare) points that need float math; the common consumers
(cosine top-k over a quantized index) decode per Arrow batch.

Layout: little-endian packed numpy bytes, dim implied by byte length
(f16: 2 bytes/elem; int8: 1 byte/elem with a per-vector scale prefix of
4 bytes f32 -- symmetric max-abs quantization).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def pack_f16_udf():
    @pandas_udf("binary")
    def _pack(v: pd.Series) -> pd.Series:
        return v.map(pack_f16)

    return _pack


def unpack_f16_udf():
    @pandas_udf("array<float>")
    def _unpack(b: pd.Series) -> pd.Series:
        return b.map(unpack_f16)

    return _unpack


def pack_int8_udf():
    @pandas_udf("binary")
    def _pack(v: pd.Series) -> pd.Series:
        return v.map(pack_i8)

    return _pack


def unpack_int8_udf():
    @pandas_udf("array<float>")
    def _unpack(b: pd.Series) -> pd.Series:
        return b.map(unpack_i8)

    return _unpack


# ---- pure per-vector kernels (shared by the UDFs above and the
# collection's in-pipeline packing in embed_column) ----


def pack_f16(x) -> bytes | None:
    if x is None:
        return None
    return np.asarray(x, dtype=np.float16).tobytes()


def unpack_f16(b):
    if b is None:
        return None
    return np.frombuffer(b, dtype=np.float16).astype(np.float32)


def pack_i8(x) -> bytes | None:
    """Symmetric max-abs int8: [4-byte f32 scale][dim bytes int8]."""
    if x is None:
        return None
    a = np.asarray(x, dtype=np.float32)
    scale = float(np.max(np.abs(a))) or 1.0
    q = np.clip(np.round(a / scale * 127.0), -127, 127).astype(np.int8)
    return np.float32(scale).tobytes() + q.tobytes()


def unpack_i8(b):
    if b is None:
        return None
    scale = np.frombuffer(b[:4], dtype=np.float32)[0]
    q = np.frombuffer(b[4:], dtype=np.int8).astype(np.float32)
    return q / 127.0 * scale


PACK_KERNELS = {"f16": pack_f16, "i8": pack_i8}
UNPACK_KERNELS = {"f16": unpack_f16, "i8": unpack_i8}


_PACK = {"f16": pack_f16_udf, "i8": pack_int8_udf}
_UNPACK = {"f16": unpack_f16_udf, "i8": unpack_int8_udf}


def quantize_column(df, vec_col: str, variant: str, out_col: str | None = None):
    """array<float> -> packed binary at the given variant ('f16'|'i8')."""
    if variant == "f32":
        return df
    if variant not in _PACK:
        raise ValueError(f"unknown variant {variant!r}; expected f32/f16/i8")
    return df.withColumn(out_col or vec_col, _PACK[variant]()(F.col(vec_col)))


def dequantize_column(df, vec_col: str, variant: str, out_col: str | None = None):
    if variant == "f32":
        return df
    if variant not in _UNPACK:
        raise ValueError(f"unknown variant {variant!r}; expected f32/f16/i8")
    return df.withColumn(out_col or vec_col, _UNPACK[variant]()(F.col(vec_col)))
