"""Multimodal column plumbing (north-star extension — SURVEY §7 M6).

Images/audio/video are opaque ``binary`` columns with typed metadata;
the engine's job is the Spark-side plumbing — schema, Arrow batch
shape, partition-friendly UDF signatures — while actual codecs are
STUBBED (this container has no image/audio libraries): ``decode_*``
raises ``NotImplementedError`` unless ``fake=True``, where a
deterministic fake decoder produces structured features from the raw
bytes so every downstream stage is exercised end-to-end.

Scale notes: payloads travel through ``mapInPandas`` as Arrow binary
arrays (zero-copy batches); feature extraction is embarrassingly
parallel with no shuffle. For 100 TB media, partition input files by
content id so a decode failure quarantines one partition, and keep
features in a separate (narrow) table — never re-shuffle payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, byte_mean double, byte_std double, "
    "header binary, format string"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"

_FORMAT_MAGIC = {
    b"\x89PN": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIF": "riff",
    b"ID3": "mp3",
}


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: the UTF-8 bytes
    of the text stand in for an opaque payload. Output:
    (media_id, payload binary, media_type, n_chars)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("fake/bytes").alias("media_type"),
        "n_chars",
    )


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize each payload.

    Real decoders are not available in this environment — with
    ``fake=False`` this raises ``NotImplementedError`` at plan time
    (deliberate; see module docstring). The fake tier computes
    deterministic byte statistics so schema/batching is fully tested.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "container; pass fake=True for the deterministic byte-stats tier"
        )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                header = bytes(payload[:3])
                out.append(
                    (
                        int(mid),
                        int(b.size),
                        float(b.mean()) if b.size else 0.0,
                        float(b.std()) if b.size else 0.0,
                        header,
                        _FORMAT_MAGIC.get(header, "unknown"),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_bytes", "byte_mean", "byte_std", "header", "format"],
            )

    return media.select("media_id", "payload").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 16, fake: bool = False
) -> DataFrame:
    """Frame sampling: emit ``n_frames`` evenly spaced byte windows per
    payload (the video-frame-sampling plumbing; a real build swaps the
    slicer for a codec)."""
    if not fake:
        raise NotImplementedError(
            "frame decoding requires codec libraries; pass fake=True for "
            "the byte-window tier"
        )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if len(raw) == 0:
                    continue
                step = max((len(raw) - frame_bytes) // max(n_frames - 1, 1), 1)
                for i in range(n_frames):
                    start = min(i * step, max(len(raw) - frame_bytes, 0))
                    mids.append(int(mid))
                    idxs.append(i)
                    payloads.append(raw[start : start + frame_bytes])
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "frame": payloads}
            )

    return media.select("media_id", "payload").mapInPandas(frames, schema=FRAME_SCHEMA)
