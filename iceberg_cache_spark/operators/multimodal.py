"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns
with a metadata struct (modality, mime, nbytes). Decode / resize /
frame-sample are Arrow-batched ``mapInPandas`` stages — the Spark-side
contract (schema, batch shape, partitioning) is real and tested; the
actual codec call is stubbed because media libraries are not available
in this environment (``NotImplementedError`` behind ``fake=True``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("nbytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("nbytes", T.LongType()),
        T.StructField("feat_hash", T.StringType()),
    ]
)


def with_media_column(
    df: DataFrame, payload_col: str, modality: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Wrap a column as (payload: binary, media_meta: struct). This is the
    canonical on-lake layout: payload stays opaque; metadata is queryable
    and prunable (partition/zone-map on modality, mime, nbytes)."""
    payload = F.col(payload_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("nbytes"),
        ),
    )


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real decoder entry point (PIL/librosa/av). Not available here."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use extract_features(fake=True) for the plumbing path"
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_size: int = 64,
    every_n: int = 2,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video/audio payloads: one output row per kept
    frame, Arrow-batched. With ``fake=True`` frames are fixed-size byte
    windows of the payload (a deterministic stand-in for codec frame
    extraction, which needs av/ffmpeg — not present here). The Spark
    contract is the real thing: fan-out row multiplicity, binary output
    column, per-partition batching."""

    # self-contained closure: see extract_features note (by-value pickling)
    def run(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            ids, fids, blobs, hashes = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if not fake:  # pragma: no cover
                    raise NotImplementedError(
                        "media codecs unavailable; use fake=True"
                    )
                if payload is None:
                    continue  # NULL payload: no frames (missing blob)
                data = bytes(payload)
                frames = [
                    data[i : i + frame_size]
                    for i in range(0, max(len(data), 1), frame_size)
                ]
                for fid, frame in enumerate(frames[::every_n]):
                    ids.append(doc_id)
                    fids.append(fid)
                    blobs.append(frame)
                    hashes.append(_hashlib.md5(frame).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_id": _pd.Series(fids, dtype="int64"),
                    "frame_bytes": _pd.Series(blobs, dtype="object"),
                    "frame_hash": _pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over (id, payload) partitions.

    With ``fake=True`` the 'feature' is a deterministic sha-free stand-in
    (md5 of the payload bytes + byte length) so the distributed plumbing
    — mapInPandas signature, Arrow batch shape, output schema — is fully
    exercised and oracle-checkable without codecs.
    """

    # NOTE: the closure must be fully self-contained (locals + stdlib
    # imports inside) so cloudpickle ships it BY VALUE — a module-level
    # function pickles by reference and breaks on workers whose
    # PYTHONPATH doesn't include this repo.
    def run(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if not fake:  # pragma: no cover
                raise NotImplementedError("media codecs unavailable; use fake=True")
            # NULL payloads (missing blobs are a fact of life in a
            # 100 TB media lake) yield NULL features, mirroring
            # octet_length(NULL)/md5(NULL) — not a worker crash
            # (r6 NULL-robustness gate)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "nbytes": _pd.array(
                        [None if b is None else len(b) for b in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "feat_hash": pdf["payload"].map(
                        lambda b: None
                        if b is None
                        else _hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, FEATURE_SCHEMA)
