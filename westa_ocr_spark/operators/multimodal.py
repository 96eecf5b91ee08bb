"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of typed
metadata, processed by Arrow-batched ``mapInPandas`` stages — the same
plumbing as HTML/PDF extraction (schema, partitioning, batch shape are
real and tested). The codec step itself is STUBBED: the decode
libraries (PIL/ffmpeg/librosa) are not in this container, so
``decode_image``/``sample_frames``/``extract_audio_features`` run a
clearly-marked deterministic fake unless the real library imports
(gated behind try/except). Swapping in the real codec changes ONE
function body, none of the Spark plumbing.

Magic-byte sniffing (media_kind) is real; so are batch shapes, schema
contracts, and the skew story (oversized media uses the same
skew_split as oversized HTML).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def media_kind(col: F.Column) -> F.Column:
    """Sniff media type from magic bytes (JVM-side, codegen'd)."""
    hexpfx = F.hex(F.substring(col, 1, 4))
    return (
        F.when(hexpfx.startswith("FFD8FF"), F.lit("jpeg"))
        .when(hexpfx == "89504E47", F.lit("png"))
        .when(hexpfx.startswith("47494638"), F.lit("gif"))
        .when(hexpfx.startswith("52494646"), F.lit("riff"))  # wav/avi
        .when(hexpfx.startswith("494433"), F.lit("mp3"))
        .when(F.substring(col, 5, 4) == F.lit(b"ftyp"), F.lit("mp4"))
        .when(hexpfx.startswith("255044"), F.lit("pdf"))
        .otherwise(F.lit("unknown"))
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

_FEATURE_DIM = 16


def _fake_decode(data: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decode + feature extraction.

    Derives (width, height, feature[16]) from a sha256 of the bytes —
    stable across runs/machines, so the plumbing is testable without
    the codec. Replace with PIL decode + model features in production.
    """
    digest = hashlib.sha256(data).digest()
    width = 64 + digest[0] * 4
    height = 64 + digest[1] * 4
    feature = [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
        for i in range(_FEATURE_DIM)
    ]
    return width, height, feature


def extract_image_features(media: DataFrame, url_col: str = "url",
                           data_col: str = "data") -> DataFrame:
    """Arrow-batched image decode + feature extraction over binary rows.

    Per-row error capture mirrors the extraction pipeline: a payload
    the decoder rejects becomes a ``status='ERROR'`` row.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for url, data in zip(pdf[url_col], pdf[data_col]):
                row = {
                    "url": url,
                    "kind": "unknown",
                    "n_bytes": len(data) if data is not None else 0,
                    "width": None,
                    "height": None,
                    "feature": None,
                    "status": "DONE",
                    "error": None,
                }
                try:
                    if not data:
                        raise ValueError("empty payload")
                    if data[:3] == b"\xff\xd8\xff":
                        row["kind"] = "jpeg"
                    elif data[:4] == b"\x89PNG":
                        row["kind"] = "png"
                    if _HAVE_PIL:  # pragma: no cover - real codec path
                        raise NotImplementedError(
                            "real PIL decode not wired in this build"
                        )
                    w, h, feat = _fake_decode(bytes(data))
                    row.update(width=w, height=h, feature=feat)
                except (ValueError, NotImplementedError) as exc:
                    row.update(status="ERROR", error=f"decode: {exc}")
                out.append(row)
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.select(
        F.col(url_col).alias("url"), F.col(data_col).alias("data")
    ).mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10,
                  max_frames: int = 4, url_col: str = "url",
                  data_col: str = "data") -> DataFrame:
    """Video frame sampling: 1 binary row -> N frame rows (1-based),
    same fan-out contract as PDF page split. Decode is stubbed with a
    deterministic byte-slice fake; the Spark shape (explode inside the
    Arrow batch, 1-based indices) is real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for url, data in zip(pdf[url_col], pdf[data_col]):
                if not data:
                    out.append(
                        {"url": url, "frame_index": 1, "frame": None,
                         "status": "ERROR"}
                    )
                    continue
                blob = bytes(data)
                n = min(max_frames, max(1, len(blob) // every_n))
                step = max(1, len(blob) // n)
                for idx in range(1, n + 1):
                    out.append(
                        {
                            "url": url,
                            "frame_index": idx,
                            "frame": blob[(idx - 1) * step : idx * step],
                            "status": "DONE",
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields]
            )

    return media.select(
        F.col(url_col).alias("url"), F.col(data_col).alias("data")
    ).mapInPandas(batches, schema=FRAME_SAMPLE_SCHEMA)
