"""Multimodal queries (binary payload columns) + duckdb oracles.

mm2 runs a real mapInPandas (Arrow-batched Python) decode stage whose
fake kernel is md5-derived, so the SQL oracle reproduces it exactly —
a strong correctness check on the UDF plumbing itself.
"""

from __future__ import annotations

from aristoteles_spark.multimodal.features import (
    FRAME_BYTES,
    FRAME_STRIDE,
    RESIZE_TARGET,
    binary_stats,
    decode_features,
    frame_sample,
    resize_features,
    with_payload,
)
from aristoteles_spark.sources.parquet_source import fan_out, load_table


def _docs(spark, sf_dir):
    # fan_out: codec kernels are compute-bound; single-row-group scans
    # would otherwise decode on one core (see parquet_source.fan_out)
    return with_payload(fan_out(load_table(spark, sf_dir, "documents")))


def q_binary_stats(spark, sf_dir):
    return binary_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def q_decode_features(spark, sf_dir):
    return decode_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_frame_sample(spark, sf_dir):
    return frame_sample(_docs(spark, sf_dir)).orderBy("doc_id")


def q_perceptual_buckets(spark, sf_dir):
    """Multimodal near-dup BLOCKING: bucket decoded payloads on coarse
    perceptual features (channel count x 1/16-quantized mean pixel) — the
    candidate-generation step an image dedup pipeline runs so the
    expensive pairwise compare only happens within buckets. The decode is
    the Arrow-batched mapInPandas stage (real plumbing, fake kernel);
    the bucketing is one partial-aggregated groupBy — at 100 TB the blob
    bytes never shuffle, only (doc_id, tiny features)."""
    from pyspark.sql import functions as F

    feats = decode_features(_docs(spark, sf_dir))
    return (
        feats.groupBy(
            "channels",
            F.floor(F.col("mean_px") * 16).cast("int").alias("px_band"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .orderBy("channels", "px_band")
    )


def q_resize(spark, sf_dir):
    """Batch resize stage (decode -> aspect-fit -> re-encode digest)
    through the same Arrow-batched mapInPandas seam as mm2."""
    return resize_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_codec(spark, sf_dir):
    """REAL PNG codec in the decode stage (formats/imaging.py, not a
    fake kernel): digest -> 4x4 image -> PNG encode (filter doc_id%5)
    -> pure-Python PNG decode -> features. Lossless round-trip makes
    the mean SQL-stateable, so the driver's oracle genuinely checks
    the decoder (all five PNG row filters included)."""
    from aristoteles_spark.multimodal.features import real_codec_features

    return real_codec_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_resize(spark, sf_dir):
    """REAL resize pipeline: PNG decode -> nearest-neighbor 8x8 upscale
    -> BMP round-trip -> top-left-crop mean (== mean of digest bytes
    0,1,4,5 by the NN index map — oracle-stated)."""
    from aristoteles_spark.multimodal.features import real_resize_features

    return real_resize_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_audio(spark, sf_dir):
    """REAL WAV codec: digest -> 64 int16 samples -> PCM16 RIFF encode
    -> pure-Python decode -> rate/duration/RMS/peak, oracle-stated from
    the digest bytes (exact integer synthesis)."""
    from aristoteles_spark.multimodal.features import real_audio_features

    return real_audio_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_video(spark, sf_dir):
    """REAL video container (Y4M) frame-sampling: digest -> four 2x2
    luma frames -> YUV4MPEG2 encode -> container parse -> stride-2
    sample -> mean luma, oracle-stated from the digest bytes."""
    from aristoteles_spark.multimodal.features import real_video_features

    return real_video_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_jpeg(spark, sf_dir):
    """REAL baseline JPEG encode->decode inside the mapInPandas seam
    (formats/jpeg.py): DC-exact quadrant images make mean_px
    SQL-stateable, so the driver oracle checks the actual Huffman
    entropy coder, restart-marker handling, dequantization and IDCT."""
    from aristoteles_spark.multimodal.features import real_jpeg_features

    return real_jpeg_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_progressive_jpeg(spark, sf_dir):
    """REAL progressive JPEG (SOF2) encode->decode inside the
    mapInPandas seam (formats/jpeg_progressive.py): DC-exact quadrant
    images keep mean_px SQL-stateable, so the driver oracle checks the
    multi-scan progression — spectral selection, successive
    approximation, EOB runs and refinement bits."""
    from aristoteles_spark.multimodal.features import (
        real_progressive_jpeg_features,
    )

    return real_progressive_jpeg_features(_docs(spark, sf_dir)).orderBy(
        "doc_id"
    )


def q_real_gif(spark, sf_dir):
    """REAL GIF (LZW) encode->decode inside the mapInPandas seam
    (formats/gif.py); lossless round-trip makes mean_px SQL-stateable,
    so the driver oracle checks the LZW coder and interlace weave."""
    from aristoteles_spark.multimodal.features import real_gif_features

    return real_gif_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_tiff(spark, sf_dir):
    """REAL TIFF (IFD/strip) encode->decode in the mapInPandas seam
    (formats/tiff.py); lossless round-trip keeps mean_px
    SQL-stateable."""
    from aristoteles_spark.multimodal.features import real_tiff_features

    return real_tiff_features(_docs(spark, sf_dir)).orderBy("doc_id")


def q_real_webp(spark, sf_dir):
    """REAL WebP lossless (VP8L) encode->decode inside the mapInPandas
    seam (formats/webp.py): RIFF framing, prefix codes, color-indexing
    (even ids) and subtract-green (odd ids) transforms; lossless
    round-trip keeps mean_px SQL-stateable. The decoder additionally
    handles predictor/cross-color transforms, color cache, LZ77 with
    the 2D distance map, and meta prefix groups (pinned by
    tests/test_webp.py incl. a real libwebp-encoded alpha stream)."""
    from aristoteles_spark.multimodal.features import real_webp_features

    return real_webp_features(_docs(spark, sf_dir)).orderBy("doc_id")



def q_phash_buckets(spark, sf_dir):
    """mm15 — perceptual-hash dedup blocking over REAL decoded pixels:
    the dHash census an image-dedup pipeline runs before any pairwise
    compare. Decode + hash happen in the Arrow-batched mapInPandas seam
    (real PNG codec, all five row filters); the census is one partial-
    aggregated groupBy on the 12-bit hash — at 100 TB the image bytes
    never shuffle, only (doc_id, int), and the bucket histogram is the
    skew/recall readout (same role dd11 plays for text LSH)."""
    from pyspark.sql import functions as F

    from aristoteles_spark.multimodal.features import real_dhash_features

    h = real_dhash_features(_docs(spark, sf_dir))
    return (
        h.groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .orderBy("dhash")
    )


QUERIES = {
    "mm1_binary_stats": q_binary_stats,
    "mm15_phash_buckets": q_phash_buckets,
    "mm10_real_jpeg": q_real_jpeg,
    "mm11_real_gif": q_real_gif,
    "mm12_real_tiff": q_real_tiff,
    "mm13_progressive_jpeg": q_real_progressive_jpeg,
    "mm14_real_webp": q_real_webp,
    "mm2_decode_features": q_decode_features,
    "mm3_frame_sample": q_frame_sample,
    "mm4_perceptual_buckets": q_perceptual_buckets,
    "mm5_resize": q_resize,
    "mm6_real_codec": q_real_codec,
    "mm7_real_resize": q_real_resize,
    "mm8_real_audio": q_real_audio,
    "mm9_real_video": q_real_video,
}


def _byte_val(i: int) -> str:
    """Value of md5-digest byte ``i`` (0-based) from the hex string, as
    plain SQL both engines accept: 16*pos(hi) + pos(lo) via strpos over
    the hex alphabet (md5() emits lowercase hex in both engines)."""
    hi = f"(strpos('0123456789abcdef', substr(md5(text), {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr(md5(text), {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _byte_mean(idx: list[int]) -> str:
    total = " + ".join(_byte_val(i) for i in idx)
    return f"(({total}) / {len(idx)}.0 / 255.0)"


def _hex_int(start: int, n: int) -> str:
    # 1-indexed md5 hex substring as big-endian int (matches int(h[a:b],16)).
    # duckdb md5(VARCHAR) hashes the UTF-8 bytes == Spark md5(encode(text)).
    return f"CAST(concat('0x', substr(md5(text), {start + 1}, {n})) AS BIGINT)"


def _jpeg_quadrant(i: int) -> str:
    return f"(64 + 2 * ({_byte_val(i)} % 64))"


def _dhash_sql() -> str:
    terms = []
    for r in range(4):
        for c in range(3):
            left = _byte_val(4 * r + c)
            right = _byte_val(4 * r + c + 1)
            terms.append(
                f"(CASE WHEN {left} > {right} THEN {1 << (r * 3 + c)} ELSE 0 END)"
            )
    return "(" + " + ".join(terms) + ")"


ORACLE = {
    "mm15_phash_buckets": (
        f"WITH h AS (SELECT doc_id, {_dhash_sql()} AS dhash FROM documents) "
        "SELECT CAST(dhash AS INTEGER) AS dhash, count(*) AS n_docs, "
        "min(doc_id) AS keep_id FROM h GROUP BY dhash ORDER BY dhash"
    ),
    "mm10_real_jpeg": (
        "SELECT doc_id, 16 AS width, 16 AS height, 1 AS channels, "
        f"(({' + '.join(_jpeg_quadrant(i) for i in range(4))}) / 4.0 / 255.0) "
        "AS mean_px FROM documents ORDER BY doc_id"
    ),
    "mm13_progressive_jpeg": (
        "SELECT doc_id, 16 AS width, 16 AS height, 1 AS channels, "
        f"(({' + '.join(_jpeg_quadrant(4 + i) for i in range(4))}) / 4.0 / 255.0) "
        "AS mean_px FROM documents ORDER BY doc_id"
    ),
    "mm11_real_gif": (
        "SELECT doc_id, 4 AS width, 4 AS height, 1 AS channels, "
        f"{_byte_mean(list(range(16)))} AS mean_px "
        "FROM documents ORDER BY doc_id"
    ),
    "mm14_real_webp": (
        "SELECT doc_id, 4 AS width, 4 AS height, 1 AS channels, "
        f"{_byte_mean(list(range(16)))} AS mean_px "
        "FROM documents ORDER BY doc_id"
    ),
    "mm12_real_tiff": (
        "SELECT doc_id, 4 AS width, 4 AS height, 1 AS channels, "
        f"{_byte_mean(list(range(16)))} AS mean_px "
        "FROM documents ORDER BY doc_id"
    ),
    "mm1_binary_stats": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "md5(text) AS digest FROM documents ORDER BY doc_id"
    ),
    "mm2_decode_features": (
        f"SELECT doc_id, "
        f"CAST(1 + {_hex_int(0, 4)} % 1024 AS INTEGER) AS width, "
        f"CAST(1 + {_hex_int(4, 4)} % 1024 AS INTEGER) AS height, "
        f"CAST(1 + {_hex_int(8, 1)} % 4 AS INTEGER) AS channels, "
        f"{_hex_int(9, 4)} / 65535.0 AS mean_px "
        "FROM documents ORDER BY doc_id"
    ),
    "mm3_frame_sample": (
        f"SELECT doc_id, "
        f"CAST(ceil(octet_length(encode(text)) / {float(FRAME_BYTES)}) AS BIGINT) AS n_frames, "
        f"CAST(floor((ceil(octet_length(encode(text)) / {float(FRAME_BYTES)}) + {FRAME_STRIDE - 1}) / {float(FRAME_STRIDE)}) AS BIGINT) AS n_sampled, "
        # substr on VARCHAR is char-based; byte-exact here because the test
        # corpus is pure ASCII (verified octet_length == length for all rows)
        f"md5(substr(text, 1, {FRAME_BYTES})) AS frame0_digest "
        "FROM documents ORDER BY doc_id"
    ),
    "mm5_resize": (
        f"WITH d AS (SELECT doc_id, text, "
        f"CAST(1 + {_hex_int(0, 4)} % 1024 AS INTEGER) AS width, "
        f"CAST(1 + {_hex_int(4, 4)} % 1024 AS INTEGER) AS height "
        "FROM documents), "
        "r AS (SELECT doc_id, text, width, height, "
        f"CAST(greatest(1, (width * {RESIZE_TARGET}) // greatest(width, height)) AS INTEGER) AS out_w, "
        f"CAST(greatest(1, (height * {RESIZE_TARGET}) // greatest(width, height)) AS INTEGER) AS out_h "
        "FROM d) "
        "SELECT doc_id, width, height, out_w, out_h, "
        "md5(md5(text) || ':' || CAST(out_w AS VARCHAR) || 'x' || "
        "CAST(out_h AS VARCHAR)) AS resized_digest "
        "FROM r ORDER BY doc_id"
    ),
    "mm6_real_codec": (
        "SELECT doc_id, 4 AS width, 4 AS height, 1 AS channels, "
        f"{_byte_mean(list(range(16)))} AS mean_px "
        "FROM documents ORDER BY doc_id"
    ),
    "mm7_real_resize": (
        "SELECT doc_id, 8 AS out_w, 8 AS out_h, "
        f"{_byte_mean([0, 1, 4, 5])} AS crop_mean "
        "FROM documents ORDER BY doc_id"
    ),
    "mm8_real_audio": (
        "SELECT doc_id, 8000 AS sample_rate, 64 AS n_samples, "
        "64 / 8000.0 AS duration_s, "
        "sqrt(("
        + " + ".join(
            f"({_byte_val(i)} - 128) * 256.0 * ({_byte_val(i)} - 128) * 256.0"
            for i in range(16)
        )
        + ") / 16.0) AS rms, "
        "CAST(greatest("
        + ", ".join(f"abs(({_byte_val(i)} - 128) * 256)" for i in range(16))
        + ") AS BIGINT) AS peak "
        "FROM documents ORDER BY doc_id"
    ),
    "mm9_real_video": (
        "SELECT doc_id, 2 AS width, 2 AS height, 4 AS n_frames, "
        "2 AS n_sampled, "
        f"{_byte_mean([0, 1, 2, 3, 8, 9, 10, 11])} AS sampled_mean "
        "FROM documents ORDER BY doc_id"
    ),
    "mm4_perceptual_buckets": (
        f"WITH feats AS (SELECT doc_id, "
        f"CAST(1 + {_hex_int(8, 1)} % 4 AS INTEGER) AS channels, "
        f"{_hex_int(9, 4)} / 65535.0 AS mean_px "
        "FROM documents) "
        "SELECT channels, CAST(floor(mean_px * 16) AS INT) AS px_band, "
        "count(*) AS n_docs, min(doc_id) AS keep_id "
        "FROM feats GROUP BY channels, px_band ORDER BY channels, px_band"
    ),
}
