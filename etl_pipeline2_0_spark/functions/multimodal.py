"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design for the 100 TB case: media payloads ride as ``binary`` cells with a
typed metadata struct alongside (mime, n_bytes, checksum); decode /
feature-extract / resize / frame-sample run as Arrow-batched functions over
``mapInPandas`` so each task streams record batches without materializing
the whole partition.

The container has no image/audio codecs, so the real decoders are STUBBED:
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
optional libs import, and ``fake_decode_features`` provides a deterministic
stand-in (byte-stat features) so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Optional decoders: gated imports, never required at module load.
try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, "
    "meta struct<mime: string, n_bytes: bigint, checksum: string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, n_bytes bigint, byte_mean double, byte_min int, "
    "byte_max int, head_hex string"
)


def attach_binary(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Build a typed media frame from any source column: payload as binary +
    metadata struct.  (With real media, the payload would come from
    ``spark.read.format("binaryFile")`` or decoded E4 base64 hits —
    ``unbase64`` — instead of text encoding.)"""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col(content_col)).cast("bigint").alias("n_bytes"),
            F.md5(F.col(content_col)).alias("checksum"),
        ).alias("meta"),
    )


def media_from_base64(
    detected: DataFrame,
    b64_col: str = "b64_blocks",
    content_col: str = "content",
) -> DataFrame:
    """Decode the E4 base64 hits into binary payloads (the reference never
    decodes — this is the scale-pipeline extension).

    ``b64_blocks`` carries bare payloads (the reference's re.findall
    group-1 semantics, see operators/detect.py), so the mime tag is
    recovered by matching each payload against the data-URIs still present
    in the source document; payloads with no data-URI prefix get
    ``application/octet-stream``.  All native expressions — the URI
    extraction is one pass per document, carried through the explode."""
    uri_entries = F.transform(
        F.regexp_extract_all(
            F.col(content_col),
            F.lit(r"data:[^;,\s]+;base64,[A-Za-z0-9+/=]+"),
            F.lit(0),
        ),
        lambda m: F.named_struct(
            F.lit("payload"),
            F.regexp_extract(m, r";base64,([A-Za-z0-9+/=]+)$", 1),
            F.lit("mime"),
            F.regexp_extract(m, r"^data:([^;]+);base64,", 1),
        ),
    )
    exploded = detected.select(
        F.col("doc_id"),
        uri_entries.alias("__uris"),
        F.explode(F.col(b64_col)).alias("b64"),
    )
    matching = F.filter(F.col("__uris"), lambda e: e["payload"] == F.col("b64"))
    mime = F.when(F.size(matching) > 0, matching[0]["mime"]).otherwise(
        F.lit("application/octet-stream")
    )
    return exploded.select(
        F.xxhash64("doc_id", "b64").alias("media_id"),
        F.unbase64("b64").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.octet_length(F.unbase64("b64")).cast("bigint").alias("n_bytes"),
            F.md5(F.unbase64("b64").cast("string")).alias("checksum"),
        ).alias("meta"),
    )


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode (width/height/mode per payload).  STUB: requires an
    image codec library that is not in this container."""
    if not _HAS_PIL:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires an image codec library (e.g. Pillow); "
            "not available in this environment — use fake_decode_features "
            "for pipeline plumbing tests"
        )
    raise NotImplementedError("real decoder wiring lands with the codec lib")


def fake_decode_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Deterministic stand-in decoder: byte statistics per payload via
    ``mapInPandas`` — the exact plumbing (Arrow record-batch iteration,
    schema contract, per-partition streaming) a real decoder would use."""

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            rows = {
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                "byte_mean": payloads.map(
                    lambda b: 0.0 if not b else round(sum(b) / len(b), 6)
                ),
                "byte_min": payloads.map(lambda b: 0 if not b else min(b)),
                "byte_max": payloads.map(lambda b: 0 if not b else max(b)),
                "head_hex": payloads.map(
                    lambda b: "" if b is None else bytes(b[:8]).hex()
                ),
            }
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


def decode_audio(media: DataFrame) -> DataFrame:
    """Real audio decode (sample rate/duration/channels).  STUB: requires an
    audio codec library that is not in this container."""
    raise NotImplementedError(
        "audio decode requires an audio codec library (e.g. soundfile); "
        "not available in this environment"
    )


def resize_image(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Resize plumbing: with a codec lib this decodes → resizes → re-encodes
    inside the same ``mapInPandas`` stream.  STUB decoder: payload is
    truncated/padded to ``width*height`` bytes — the schema contract
    (payload stays ``binary``, meta records the target dims) and the
    Arrow-batch shape are the real thing."""
    if _HAS_PIL:  # pragma: no cover - codec path lands with the lib
        raise NotImplementedError("real resize wiring lands with the codec lib")

    target = width * height

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "payload": pdf["payload"].map(
                    lambda b: bytes(b or b"").ljust(target, b"\0")[:target]
                ),
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
            }
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        resize_batches,
        schema="media_id bigint, payload binary, width int, height int",
    )


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (media_id, frame_no)
    rows for every nth frame without decoding — the shuffle-free explode the
    real sampler would feed.  Frame count is stubbed as n_bytes/1024."""
    est_frames = F.greatest(
        (F.col("meta.n_bytes") / 1024).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), est_frames - 1, F.lit(every_nth))
        ).alias("frame_no"),
    )
