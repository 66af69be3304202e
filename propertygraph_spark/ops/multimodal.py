"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* is a
deterministic fake (clearly marked); everything Spark-side is real and
designed for scale:

- payloads are `binary` columns (here synthesized deterministically from
  the documents table via unhex(md5(...)) so the whole path is
  oracle-checkable in DuckDB);
- metadata extraction runs as an Arrow-batched `mapInPandas` over the
  binary column — the exact shape a real libjpeg/ffmpeg decode stage
  would use (batch in, batch out, no per-row Python calls into Spark);
- a pure-Catalyst twin of the same metadata arithmetic exists for the
  oracle, proving the UDF path computes what it claims.

A real deployment swaps `_fake_decode` for the codec call; the schema,
partitioning, batch shape and UDF signature do not change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("checksum_b0", IntegerType(), False),
])


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake binary payload per document:
    payload = unhex(md5(text) || md5(doc_id)), 32 bytes. Stands in for a
    real image blob; derived only from table content so DuckDB can
    reproduce it bit-for-bit."""
    payload = F.unhex(F.concat(F.md5("text"),
                               F.md5(F.col("doc_id").cast("string"))))
    kind = F.when(F.col("doc_id") % 3 == 0, F.lit("image")) \
            .when(F.col("doc_id") % 3 == 1, F.lit("audio")) \
            .otherwise(F.lit("video"))
    return docs.select("doc_id", kind.alias("media_kind"),
                       payload.alias("payload"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """FAKE DECODE — deterministic stand-in for an image codec.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    that library is not in this container. The fake derives (width,
    height, checksum_b0) from the first payload bytes so the Spark-side
    plumbing is fully testable and oracle-checkable. A truncated/empty
    payload (upstream decode failure) yields (0, 0, first-byte-or-0)
    instead of killing the Python worker with an IndexError."""
    if len(payload) < 4:
        return 0, 0, (payload[0] if payload else 0)
    width = 1 + (payload[0] * 256 + payload[1]) % 4096
    height = 1 + (payload[2] * 256 + payload[3]) % 4096
    return width, height, payload[0]


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, kind, payload in zip(pdf["doc_id"], pdf["media_kind"],
                                             pdf["payload"]):
                w, h, b0 = _fake_decode(bytes(payload))
                rows.append((doc_id, kind, len(payload), w, h, b0))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(batches, MEDIA_META_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", IntegerType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("checksum_b0", IntegerType(), False),
])


def frame_sample(media: DataFrame, n_frames: int = 4,
                 frame_ms: int = 40) -> DataFrame:
    """Frame sampling for video payloads: each video row explodes into
    ``n_frames`` fixed-stride frames (FAKE FRAMES — deterministic payload
    slices standing in for ffmpeg keyframe extraction; the container has
    no codecs). The Spark shape is the real one: Arrow-batched
    mapInPandas, one input row -> n output rows, non-video rows filtered
    out before the mapInPandas stage (media_kind is a derived column, so
    the filter runs post-projection, not as a scan pushdown)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                stride = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    sl = raw[i * stride:(i + 1) * stride]
                    if not sl:
                        break
                    rows.append((doc_id, i, i * frame_ms, len(sl), sl[0]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (media.filter(F.col("media_kind") == "video")
            .select("doc_id", "payload")
            .mapInPandas(batches, FRAME_SCHEMA))


N_FEATURE_DIMS = 8

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_kind", StringType(), False),
    StructField("features", ArrayType(FloatType()), False),
])


def feature_extract(media: DataFrame,
                    dims: int = N_FEATURE_DIMS) -> DataFrame:
    """Feature extraction over binary payloads (FAKE FEATURES — byte
    values / 255 standing in for a CLIP/wav2vec forward pass; swap the
    body for the model call, the schema and batch shape stay). Output
    feeds the similarity suite directly: (doc_id, media_kind,
    features: array<float>)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, kind, payload in zip(
                    pdf["doc_id"], pdf["media_kind"], pdf["payload"]):
                raw = bytes(payload)
                # empty payload (e.g. from an upstream decode failure)
                # -> zero vector, never a worker-killing ZeroDivisionError
                feats = [raw[i % len(raw)] / 255.0 for i in range(dims)] \
                    if raw else [0.0] * dims
                rows.append((doc_id, kind, feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_kind", "features"])

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target_w: int = 224,
                target_h: int = 224) -> DataFrame:
    """Resize stage stub: real codecs absent, so this truncates the payload
    deterministically (placeholder for the resampled image) while keeping
    the production schema (payload stays binary, dims recorded)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [bytes(p)[:16] for p in pdf["payload"]]
            out["width"] = target_w
            out["height"] = target_h
            yield out

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("media_kind", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ])
    src = media.select("doc_id", "media_kind", "payload",
                       F.lit(0).alias("width"), F.lit(0).alias("height"))
    return src.mapInPandas(batches, schema)


def media_text_alignment(docs: DataFrame, emb: DataFrame,
                         dims: int = N_FEATURE_DIMS) -> DataFrame:
    """CLIP-style media-text alignment scoring — the dual-encoder gate a
    multimodal training pipeline runs before accepting an (image, text)
    pair. The media tower is the byte-feature extractor above
    (mapInPandas — the slot a real vision model forward pass fills);
    the text tower is the embeddings table's first ``dims`` components,
    int8-quantized with the exact quantize_int8 mapping
    (floor(x * 127/absmax + 0.5)). The alignment score is the INTEGER
    dot product of byte features x int8 codes, so the result is
    bit-stable across engines and cluster sizes; swap the towers for
    real models and the join + score shape stays.

    Scale shape: both towers are map-side; ONE equi-join on the doc id
    (AQE will broadcast whichever side is small); no other exchange."""
    feats = feature_extract(synthesize_media(docs), dims=dims)
    fbytes = F.transform(
        "features",
        lambda v: F.floor(v.cast("double") * 255 + 0.5).cast("long"))
    m = feats.select("doc_id", "media_kind", fbytes.alias("fbytes"))
    prefix = F.slice("embedding", 1, dims)
    t = emb.select(F.col("vec_id").alias("doc_id"), prefix.alias("e"))
    absmax = F.aggregate(
        "e", F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))
    t = t.withColumn("absmax", absmax)
    scale = F.when(F.col("absmax") > 0, 127.0 / F.col("absmax")) \
             .otherwise(F.lit(0.0))
    codes = F.transform(
        "e", lambda v: F.floor(v.cast("double") * scale + 0.5).cast("long"))
    t = t.select("doc_id", codes.alias("codes"))
    align = F.aggregate(
        F.zip_with("fbytes", "codes", lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (m.join(t, "doc_id")
            .select("doc_id", "media_kind", align.alias("align_x")))


PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_kind", StringType(), False),
    StructField("phash", LongType(), False),
])


def perceptual_hash(media: DataFrame) -> DataFrame:
    """dHash-style perceptual fingerprint over the decoded payload
    (FAKE DECODE — the 16 leading payload bytes, read as 32 4-bit
    'pixels', stand in for the grayscale thumbnail a real pHash
    pipeline downsamples to; swap the nibble slice for the PIL
    resize+gray step, the bit rule stays): bit i compares adjacent
    pixels nib[i] > nib[(i+1) % 32], packed into a 32-bit integer.
    Identical media content -> identical hash; small perturbations
    flip few bits — Hamming distance is the similarity. 32 bits keeps
    the random-pair rate at distance <= 3 around ~1e-5 (adjacent-nibble
    comparisons share a nibble, so bits are chain-correlated — the rate
    is ~10x the independent-bit estimate); a production deployment at
    10^12 images widens to the classic 64-bit hash, which is this same
    code with a 32-byte thumbnail slice.
    Arrow-batched mapInPandas like every media op (the codec boundary
    is Python by nature)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, kind, payload in zip(
                    pdf["doc_id"], pdf["media_kind"], pdf["payload"]):
                b = bytes(payload)[:16]
                if len(b) < 16:
                    ph = 0
                else:
                    nib = [v for byte in b
                           for v in (byte >> 4, byte & 15)]
                    ph = sum((1 << i) for i in range(32)
                             if nib[i] > nib[(i + 1) % 32])
                rows.append((doc_id, kind, ph))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PHASH_SCHEMA.fields])

    return media.mapInPandas(batches, PHASH_SCHEMA)


def media_phash_pairs(media: DataFrame, max_dist: int = 3) -> DataFrame:
    """Near-duplicate media detection: pairs of payloads whose
    perceptual hashes differ in <= ``max_dist`` of 16 bits. The pair
    search is NOT all-pairs: the 32-bit hash splits into 4 byte-wide
    bands, and by pigeonhole any pair within distance 3 shares at
    least one intact band — so candidates come from ONE equi-join on
    (band, byte), then the exact Hamming filter (bit_count of xor)
    keeps true near-dups. The same band trick real pHash dedup uses
    at 10^12 images (multi-index Hamming search); band join keys are
    256-valued per band, so hot keys are bounded by corpus/256."""
    ph = perceptual_hash(media)
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.expr(f"(phash div {1 << (8 * b)}) % 256").alias("nib"))
        for b in range(4)])
    banded = (ph.select("doc_id", "phash",
                        F.explode(bands).alias("bb"))
              .select("doc_id", "phash", "bb.band", "bb.nib"))
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("phash").alias("ph_a"), "band", "nib")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("phash").alias("ph_b"), "band", "nib")
    return (a.join(b, ["band", "nib"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b",
                    F.expr("bit_count(ph_a ^ ph_b)").cast("long")
                    .alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_dist))
