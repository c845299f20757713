"""Multimodal column plumbing (training-data extension).

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
Spark-side machinery — schemas, Arrow batch shapes, partition-aware
mapInPandas — is real and tested; the actual codec step is stubbed behind
``DecodeUnavailable`` (no image/audio libs in this container) with a
deterministic fake used by tests (documented; swap ``_decode_stub`` for a
real decoder on a cluster image that ships one).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decoder slot: codecs are not installed here."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feat array<float>, ok boolean"
)


def real_decode(payload: bytes, mime: str):
    """The production decoder slot.  Not available in this container."""
    raise DecodeUnavailable(
        "image/audio codecs are not installed in this environment; "
        "plug a decoder (PIL/torchaudio/ffmpeg) here on a real cluster"
    )


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode': derives an 8-float feature vector from
    the payload's sha256 — keeps the pipeline's shape/type contracts
    testable without codecs."""
    h = hashlib.sha256(payload).digest()
    return (np.frombuffer(h[:32], dtype=np.uint32).astype(np.float32) / np.float32(2**32))[:8]


def extract_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """binary payloads → per-item feature rows via mapInPandas (Arrow
    batches; one partition per task — the shape the real decoder needs:
    batch-local, no driver involvement)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok, nb, digests = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    ok.append(False)
                    nb.append(0)
                    digests.append(None)
                    continue
                b = bytes(payload)
                nb.append(len(b))
                digests.append(hashlib.sha256(b).hexdigest())
                try:
                    vec = _decode_stub(b) if use_stub else real_decode(b, "application/octet-stream")
                    feats.append([float(x) for x in vec])
                    ok.append(True)
                except DecodeUnavailable:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nb,
                    "sha256": digests,
                    "feat": feats,
                    "ok": ok,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def pages_html_media(pages: DataFrame) -> DataFrame:
    """Adapter: the pages table's html binary column as a media table —
    exercises the plumbing against the fixture corpus."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("html").alias("payload"),
        F.lit("text/html").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
