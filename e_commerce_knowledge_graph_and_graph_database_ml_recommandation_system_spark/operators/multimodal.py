"""Multimodal column plumbing (beyond-reference scope per BASELINE.json).

Images/audio/video ride as opaque BINARY columns + typed metadata; the
Spark-side machinery (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested, while the codec step is a clearly-marked
stub: the container has no image/audio libraries, so ``decode_frames``
yields a deterministic fake payload and the genuine decoder raises
NotImplementedError behind an import-try.

Scale notes: binary payloads blow past the usual row-size assumptions —
``spark.sql.files.maxPartitionBytes`` should shrink so a partition of blobs
fits executor memory, and decode runs in ``mapInPandas`` (Arrow-batched,
one batch of blobs at a time) rather than per-row UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SCHEMA = "doc_id long, frame_no int, width int, height int, n_bytes long, phash bigint"


def attach_binary(docs: DataFrame) -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload with
    typed metadata — the ingestion shape for real image/audio blobs."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(1).alias("n_streams"),
        ).alias("media_meta"),
    )


def media_metadata(docs: DataFrame) -> DataFrame:
    """Pure-SQL metadata extraction over the binary column (oracle-checkable):
    byte length, frame-count estimate, content hash of the payload."""
    b = attach_binary(docs)
    # md5 over the raw payload: base64 is engine-divergent (Spark emits
    # MIME line wrapping), binary md5 is not
    return b.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.ceil(F.col("media_meta.n_bytes") / 1024).cast("int").alias("est_frames"),
        F.conv(F.substring(F.md5("payload"), 1, 8), 16, 10).cast("long").alias("content_hash32"),
    )


def _real_decode(payload: bytes):
    """The genuine codec path — requires PIL/av, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "decode_frames uses the deterministic stub payload instead"
        ) from exc
    raise NotImplementedError("real decode wiring lands when codecs are present")


def decode_frames(docs: DataFrame, frame_bytes: int = 1024) -> DataFrame:
    """Arrow-batched 'decode': split each payload into fixed-size pseudo
    frames with deterministic fake dimensions + a per-frame hash. The
    Spark-side contract (mapInPandas, FRAME_SCHEMA, batch iteration) is
    exactly what a real decoder plugs into — swap the inner loop for
    ``_real_decode`` when codecs exist."""
    import hashlib

    src = attach_binary(docs).select("doc_id", "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(0, max(len(raw), 1), frame_bytes):
                    chunk = raw[i : i + frame_bytes]
                    h = int(hashlib.md5(chunk).hexdigest()[:8], 16)
                    rows.append(
                        (
                            int(doc_id),
                            i // frame_bytes,
                            64 + h % 64,  # fake width
                            64 + (h >> 8) % 64,  # fake height
                            len(chunk),
                            h,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "width", "height", "n_bytes", "phash"]
            )

    return src.mapInPandas(decode, schema=FRAME_SCHEMA)


def frame_features(frames: DataFrame) -> DataFrame:
    """Feature-extract step over decoded frames (JVM-side aggregation):
    per-doc frame count, mean fake-luma (phash-derived), byte volume."""
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.pmod(F.col("phash"), F.lit(256))), 6).alias("mean_luma"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )
