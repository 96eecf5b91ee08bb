"""Multimodal (image/video payload) queries: synthetic-but-real media
bytes, header-parse features, frame sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from westa_ocr_spark.functions import textfns  # noqa: F401
from westa_ocr_spark.functions.textfns import round_det  # noqa: F401
from westa_ocr_spark.queries.common import (  # noqa: F401
    _SQL_NORM, _SQL_WORDS, _sql_lang_best, _sql_lang_from_best,
    _sql_lang_scores, _sql_occ, _sql_punct_ratio, _sql_quality,
    _sql_round_det, _sql_shingles, _sql_simhash16, _sql_stop_ratio,
    _sql_token_count, _t,
)

# ---------------------------------------------------------------------------
# Multimodal + page-payload operators as rows-only queries (binary
# inputs synthesized deterministically from the documents table)

def _media_df(spark, sf):
    """Synthetic media table: REAL png/jpeg/gif bytes (round 2 —
    correct CRCs, SOF segments, screen descriptors) with dimensions
    derived from doc_id, plus round-4 JPEG legs (4:2:0 / 4:4:4
    color, PROGRESSIVE color, restart-interval gray) and a garbage
    leg for the ERROR path."""
    from westa_ocr_spark.operators import multimodal as mm

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            urls, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 16 + i % 32, 16 + (i * 7) % 32
                if i % 11 == 0:
                    blob = mm.write_jpeg(w, h)
                elif i % 11 == 1:
                    blob = mm.write_png(w, h)
                elif i % 11 == 2:
                    blob = mm.write_gif(w, h)
                elif i % 11 == 3:
                    blob = mm.write_jpeg_rgb(w, h, "420")
                elif i % 11 == 4:
                    blob = mm.write_jpeg_rgb(w, h, "444")
                elif i % 11 == 5:
                    blob = mm.write_jpeg_progressive_rgb(w, h, "420")
                elif i % 11 == 6:
                    from westa_ocr_spark.kernel.jpeg_mini import (
                        write_jpeg_gray,
                    )
                    import numpy as np

                    y, x = np.mgrid[0:h, 0:w]
                    blob = write_jpeg_gray(
                        ((x * 31 + y * 17) % 256).astype(np.uint8),
                        restart_interval=2,
                    )
                elif i % 11 == 7:  # round 5: Adam7-interlaced PNG
                    blob = mm.write_png(w, h, interlace=True)
                elif i % 11 == 8:  # round 5: interlaced + LCT GIF
                    blob = mm.write_gif(
                        w, h, interlace=True, local_palette=True
                    )
                elif i % 11 == 9:  # round 5: 4:2:2 color JPEG
                    blob = mm.write_jpeg_rgb(w, h, "422")
                else:
                    blob = b"not an image " + str(i).encode()
                urls.append(f"doc://{i}")
                blobs.append(blob)
            yield pd.DataFrame({"url": urls, "data": blobs})

    schema = "url string, data binary"
    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def _q_media_features(spark, sf):
    """Image feature extraction with the vector projected to a
    hashable string column: the driver's pandas canonicalizer
    sort/hashes every column and cannot handle raw ``array<double>``
    cells (CORRECTNESS_r03 TypeError). Programmatic callers use
    :func:`extract_image_features` directly for the array form; this
    registry view rounds each element to 6 places and joins with
    ``|`` so the row is exactly comparable and hashable."""
    from westa_ocr_spark.operators.multimodal import (
        extract_image_features,
    )

    feats = extract_image_features(_media_df(spark, sf))
    sig = F.array_join(
        F.transform(
            "feature",
            lambda x: F.format_string("%.6f", round_det(x, 6)),
        ),
        "|",
    )
    return feats.select(
        "url", "kind", "n_bytes", "width", "height",
        F.when(F.col("feature").isNotNull(), sig).alias("feature_sig"),
        "status", "error",
    )


def _video_df(spark, sf):
    """Synthetic video table: REAL motion-JPEG payloads (concatenated
    decodable baseline JPEG frames, round 3) on the even leg, an
    unknown-codec binary on the odd leg to keep the byte-slice
    fallback path exercised."""
    from westa_ocr_spark.operators import multimodal as mm

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            urls, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 2 == 0:
                    blob = mm.write_mjpeg(
                        8 + i % 16, 8 + (i * 3) % 16, 6 + i % 20
                    )
                else:
                    blob = (b"RIFF....AVI fake codec " + bytes(
                        (i * 13 + k) % 256 for k in range(200)
                    ))
                urls.append(f"vid://{i}")
                blobs.append(blob)
            yield pd.DataFrame({"url": urls, "data": blobs})

    return docs.select("doc_id").mapInPandas(
        gen, schema="url string, data binary"
    )


def _q_frame_sampling(spark, sf):
    from westa_ocr_spark.operators.multimodal import sample_frames

    out = sample_frames(_video_df(spark, sf), every_n=5)
    return out.select(
        "url", "frame_index", "status",
        F.octet_length("frame").alias("frame_bytes"),
    )





def _q_audio_features(spark, sf):
    """Audio features over a synthetic audio table: WAV leg decodes
    REAL PCM (rms/peak/zero-crossing rate), MP3 leg yields frame-
    header metadata, garbage leg exercises the ERROR path."""
    from westa_ocr_spark.operators import multimodal as mm
    from westa_ocr_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 150)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            urls, blobs = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 3 == 0:
                    # cycle the PCM layouts (round 5): mono/stereo,
                    # 8/16-bit
                    blob = mm.write_wav(
                        800 + (i * 31) % 1600, period=20 + i % 80,
                        channels=1 + (i // 3) % 2,
                        bits=16 if i % 2 else 8,
                    )
                elif i % 3 == 1:
                    blob = mm.write_mp3_header(n_frames=2 + i % 4)
                else:
                    blob = b"OggS fake vorbis " + str(i).encode()
                urls.append(f"audio://{i}")
                blobs.append(blob)
            yield pd.DataFrame({"url": urls, "data": blobs})

    audio = docs.select("doc_id").mapInPandas(
        gen, schema="url string, data binary"
    )
    return extract_audio_features(audio)



# name -> (Spark DataFrame fn, DuckDB oracle SQL or None).
DEFS = {
    "media_features": (_q_media_features, None),
    "frame_sampling": (_q_frame_sampling, None),
    "audio_features": (_q_audio_features, None),
}
