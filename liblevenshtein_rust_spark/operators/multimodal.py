"""Multimodal span processing — media columns as opaque binary + metadata.

The interleaved-document input (BASELINE.json input_hint) carries media
spans `(kind='media', media_ref)` alongside text.  A training-data pipeline
needs: extract media references, fetch/decode bytes, compute features,
frame-sample — while preserving the span-sequence invariant.

Container reality: no image/audio libraries are installed, so the *decode*
step is stubbed (clearly marked), while everything Spark-side — schema,
partitioning, mapInPandas batch shape, deterministic feature derivation —
is real and tested.  Swapping `_decode_stub` for a PIL/ffmpeg call changes
no plan shape.

Scale notes:
- media work is embarrassingly parallel per-ref: `mapInPandas` over a
  repartitioned ref table, Arrow batches in/out, one Python worker per
  core, no shuffle;
- dedupe refs BEFORE decoding (`distinct` on media_ref): the same asset
  referenced by many docs is decoded once (the MemoCache discipline again);
- features come back as fixed-width float arrays → joinable with the
  embedding similarity operators (`operators/similarity`).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def extract_media_refs(docs: DataFrame) -> DataFrame:
    """(doc_id, offset, media_ref) for media spans, order preserved."""
    ex = docs.select("doc_id", F.explode("spans").alias("span"))
    return ex.where(F.col("span.kind") == "media").select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.media_ref").alias("media_ref"),
    )


def _decode_stub(media_ref: str) -> bytes:
    """STUB for the real byte fetch + decode (no media libs in container).

    Deterministic fake: bytes derived from the ref via SHA-256 squeeze, so
    tests are reproducible.  A real deployment replaces this with object
    store fetch + PIL/soundfile decode; raise NotImplementedError for
    unknown schemes to make the boundary explicit.
    """
    if not media_ref.startswith("m"):
        raise NotImplementedError(f"unsupported media_ref scheme: {media_ref!r}")
    import hashlib

    h = hashlib.sha256(media_ref.encode()).digest()
    return (h * 4)[:100]  # fixed 100-byte fake payload


def _features_from_bytes(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-float feature vector from raw bytes —
    stands in for an image/audio embedding model.  Vectorized NumPy."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def media_features(docs: DataFrame, partitions: int | None = None) -> DataFrame:
    """(media_ref, n_bytes, feature: array<float>) — one row per distinct
    media asset.  `mapInPandas` keeps the decode loop batch-wise."""
    refs = extract_media_refs(docs).select("media_ref").distinct()
    if partitions:
        refs = refs.repartition(partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                payload = _decode_stub(ref)
                rows.append(
                    (ref, len(payload), _features_from_bytes(payload).tolist())
                )
            yield pd.DataFrame(rows, columns=["media_ref", "n_bytes", "feature"])

    return refs.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


MEDIA_RESIZE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def media_resize(
    docs: DataFrame, width: int = 4, height: int = 4, partitions: int | None = None
) -> DataFrame:
    """Image-resize analog: decode (stub) → nearest-neighbor downsample →
    (media_ref, width, height, n_bytes, payload: binary), one row per
    distinct asset.

    The stub payload is treated as a 10×10 byte grid; nearest-neighbor
    resampling picks row ``r*10//height`` / col ``c*10//width`` — the exact
    index arithmetic a real image resize kernel uses, so swapping the stub
    for PIL's ``Image.resize`` changes no Spark-side shape.  Same
    dedupe-refs-before-decode + ``mapInPandas`` (Arrow, batch-wise, no
    shuffle) plan as :func:`media_features`."""
    if not (1 <= width <= 10 and 1 <= height <= 10):
        raise ValueError("stub resize supports 1..10 in each dimension")
    refs = extract_media_refs(docs).select("media_ref").distinct()
    if partitions:
        refs = refs.repartition(partitions)
    ri = (np.arange(height) * 10) // height
    ci = (np.arange(width) * 10) // width

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                grid = np.frombuffer(_decode_stub(ref), dtype=np.uint8)[:100]
                grid = grid.reshape(10, 10)
                out = grid[np.ix_(ri, ci)].tobytes()
                rows.append((ref, width, height, len(out), out))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "n_bytes", "payload"]
            )

    return refs.mapInPandas(run, MEDIA_RESIZE_SCHEMA)


def frame_sample(docs: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling analog over span sequences: keep every ``every``-th
    media span per document (ordered by offset) — the plan shape of video
    frame sampling (windowed ordinal filter), no Python."""
    from pyspark.sql import Window

    refs = extract_media_refs(docs)
    w = Window.partitionBy("doc_id").orderBy("offset")
    return (
        refs.withColumn("ordinal", F.row_number().over(w))
        .where((F.col("ordinal") - 1) % every == 0)
        .drop("ordinal")
    )


def docs_with_media_features(docs: DataFrame) -> DataFrame:
    """Join features back to (doc_id, offset) — media_ref-keyed broadcast or
    shuffle join; the span invariant is untouched (original docs unmodified)."""
    feats = media_features(docs)
    return extract_media_refs(docs).join(feats, "media_ref")


def modality_stats(docs: DataFrame) -> DataFrame:
    """Per-document modality profile of an interleaved span table — the
    first question a multimodal curation pipeline asks of every doc (how
    media-heavy is it, where does media start, how much text rides along)
    and the gate input for media-ratio filters.

    Input: (doc_id, spans: array<struct<kind,text,media_ref,offset>>).
    Output one row per doc: (doc_id, n_spans, n_text, n_media, media_frac,
    first_media_offset — null when no media, text_chars).

    Scale: pure array-HOF projection (filter/transform/aggregate inside
    one whole-stage-codegen stage) — zero shuffle, zero explode; the same
    shape argument as the simhash HOF plan (BASELINE.md §Round 2).
    """
    # null spans must read as an EMPTY profile, not garbage: F.size(null)
    # is -1 (or null) depending on spark.sql.legacy.sizeOfNull, and a
    # media-ratio gate downstream would misclassify the malformed doc —
    # every aggregate below is null-guarded (first_media_offset stays
    # null, the documented no-media value)
    is_null = F.col("spans").isNull()
    media = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
    n_spans = F.when(is_null, F.lit(0)).otherwise(F.size("spans"))
    n_media = F.when(is_null, F.lit(0)).otherwise(F.size(media))
    return docs.select(
        "doc_id",
        n_spans.cast("int").alias("n_spans"),
        (n_spans - n_media).cast("int").alias("n_text"),
        n_media.cast("int").alias("n_media"),
        F.when(n_spans > 0, F.round(n_media / n_spans, 6))
        .otherwise(F.lit(0.0))
        .alias("media_frac"),
        F.array_min(F.transform(media, lambda s: s["offset"]))
        .cast("int")
        .alias("first_media_offset"),
        F.coalesce(
            F.aggregate(
                F.col("spans"),
                F.lit(0),
                lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit(""))),
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("text_chars"),
    )
