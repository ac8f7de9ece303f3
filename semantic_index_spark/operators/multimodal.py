"""Multimodal column plumbing — images/audio/video as opaque binary columns.

[absent in reference — north-star extension] Pattern: a multimodal row is
``(id, media: binary, meta: struct)``. Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so each executor
processes columnar batches of blobs without ever collecting to the driver.

The actual codec step is STUBBED (this container has no image/audio libs):
``decode_image_batch`` raises ``NotImplementedError`` unless handed a
``decoder=`` callable, and ``fake_decode`` provides a deterministic stand-in
so the Spark-side plumbing — schema, batch shape, partitioning — is real
and tested. At 100 TB the blobs dominate I/O: keep media in its own parquet
column (columnar pruning skips it unless selected) and repartition by size
before the decode stage so batches are even.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
        StructField("feat_mean", StringType(), True),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic binary media column from text (UTF-8
    bytes) with typed metadata — exercises BinaryType end-to-end without
    codec libraries. Pure JVM expressions."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
    )


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image/audio decoder: derives a stable
    'feature' from the bytes. Replace with a real codec via ``decoder=``."""
    import hashlib

    n = len(blob or b"")
    return {
        "checksum": hashlib.md5(blob or b"").hexdigest(),
        "feat_mean": f"{(sum(blob[:256]) / max(min(n, 256), 1)):.4f}" if n else "0.0000",
    }


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode/feature-extract stage over a media DataFrame via mapInPandas.

    ``decoder`` maps raw bytes → dict(checksum, feat_mean). Without one,
    the DEFAULT IS A STUB: pass ``decoder=fake_decode`` explicitly for the
    deterministic fake, or a real codec wrapper in production. Batches
    arrive as Arrow record batches; per-batch Python overhead is amortized
    across ~10k rows."""
    if decoder is None:
        raise NotImplementedError(
            "no media codec in this environment — pass decoder=fake_decode "
            "(deterministic stub) or a real codec callable"
        )
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = [decoder(b if b is not None else b"") for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(b or b"") for b in pdf["media"]],
                    "checksum": [f["checksum"] for f in feats],
                    "feat_mean": [f["feat_mean"] for f in feats],
                }
            )

    return df.mapInPandas(_run, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 2,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Frame sampling over binary media: treat the blob as consecutive
    ``frame_bytes``-byte frames and keep every ``every_n``-th. The frame
    SPLIT is real, pure-JVM binary slicing (sequence → explode →
    substring on BinaryType) — what a video pipeline does after a real
    demuxer replaces this fixed-stride stub. Returns
    (id, frame_idx, frame: binary, n_bytes). Fan-out is ~blob/frame_bytes —
    the explode-heavy shape, so inputs are re-parallelized first."""
    from semantic_index_spark.operators.dedup import ensure_parallelism

    n_frames = F.ceil(F.octet_length(media_col) / F.lit(frame_bytes)).cast("int")
    base = ensure_parallelism(df).select(
        F.col(id_col), F.col(media_col), n_frames.alias("_nf")
    )
    frame = F.expr(f"substring({media_col}, frame_idx * {frame_bytes} + 1, {frame_bytes})")
    return (
        base.select(
            id_col,
            media_col,
            # stepped sequence generates ONLY the kept indices — exploding
            # every index then filtering by stride would materialize
            # every_n× the rows this explode-heavy stage needs.
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("_nf") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
        .select(
            F.col(id_col),
            F.col("frame_idx"),
            frame.alias("frame"),
            F.octet_length(frame).alias("n_bytes"),
        )
    )


def fake_resize(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize codec: stride-samples the
    byte stream to width·height bytes (pads with zeros). Replace with a
    real codec wrapper (PIL/opencv) via ``resizer=`` in production."""
    target = max(width * height, 1)
    if not blob:
        return bytes(target)
    if len(blob) >= target:
        stride = len(blob) / target
        return bytes(blob[int(i * stride)] for i in range(target))
    return bytes(blob) + bytes(target - len(blob))


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage over a media DataFrame via Arrow-batched mapInPandas —
    same plumbing contract as :func:`extract_features`: schema preserved,
    blobs replaced, width/height metadata updated. ``resizer`` defaults to
    the STUB (`fake_resize`); inject a real codec in production."""
    fn = resizer or fake_resize

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = pdf.copy()
            out["media"] = [fn(b if b is not None else b"", width, height) for b in pdf["media"]]
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(_run, schema=df.schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate over a media table: byte sizes per mime type.
    Selecting only metadata columns means the parquet reader never touches
    the blob column (column pruning) — the reason media lives in a column,
    not separate files."""
    return df.groupBy("mime").agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("media")).alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


def frame_signature_vec(frame_col: str = "frame", dim: int = 4) -> Column:
    """Deterministic per-frame feature vector from the frame's md5: each
    component is 8 hex chars → uint32 / 2^32 ∈ [0, 1). A portable stand-in
    for a real frame encoder (CLIP/VGGish) with the same schema
    (array<double>), so the downstream pooling plumbing is exercised and
    engine-checkable. md5 = 32 hex chars, so dim <= 4."""
    if not 1 <= dim <= 4:
        raise ValueError(f"frame_signature_vec: need 1 <= dim <= 4, got {dim}")
    h = F.md5(F.col(frame_col))
    return F.array(
        *[
            (F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("double") / F.lit(float(1 << 32)))
            for j in range(dim)
        ]
    )


def pool_frame_features(
    df: DataFrame,
    id_col: str = "media_id",
    vec_col: str = "feature",
    out_col: str = "pooled",
) -> DataFrame:
    """Mean-pool per-frame feature vectors into one media-level embedding —
    the standard video/audio aggregation after frame-level encoding.

    ONE shuffle: collect_list gathers each media's frame vectors (bounded
    by frames-per-media, which media duration bounds — NOT corpus size),
    then the element-wise sum folds JVM-side via aggregate/zip_with and
    divides by the frame count. No Python, no per-dimension re-shuffle (a
    posexplode → groupBy(id, dim) → re-assemble shape would shuffle
    dim× the rows). Returns (id, n_frames, out_col: array<double>)."""
    # count(vec_col), not count(*): collect_list drops NULL vectors, so the
    # divisor must count exactly the frames that made it into the fold (a
    # NULL-feature frame would otherwise deflate the mean).
    agg = df.groupBy(id_col).agg(
        F.collect_list(vec_col).alias("_vs"), F.count(F.col(vec_col)).alias("n_frames")
    )
    summed = F.aggregate(
        "_vs",
        # try_element_at/array_size: a group whose every vector was NULL
        # has an EMPTY _vs — plain _vs[0] would throw, and the fold's init
        # must still evaluate. Such groups pool to NULL below.
        F.expr(
            "cast(array_repeat(0.0D, coalesce(array_size(try_element_at(_vs, 1)), 0))"
            " as array<double>)"
        ),
        lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q.cast("double")),
    )
    return agg.select(
        id_col,
        "n_frames",
        F.when(
            F.col("n_frames") > 0,
            F.transform(summed, lambda v: v / F.col("n_frames")),
        ).alias(out_col),
    )


def shared_frame_pairs(
    frames: DataFrame,
    id_col: str = "media_id",
    frame_col: str = "frame",
    min_shared: int = 2,
) -> DataFrame:
    """Partial-duplicate media detection: pairs of media sharing at least
    ``min_shared`` DISTINCT frame fingerprints — the video-dedup primitive
    (full re-uploads, clipped copies, spliced compilations all share
    frames). With a real perceptual frame signature swapped in for the
    md5, the same plan catches re-encodes.

    Scale shape: the (id, frame-hash) table deduplicates first, then an
    inverted-index equi-join on the hash — the same Σdf² candidate shape
    as the shingle joins (a frame shared by k media contributes k(k−1)/2
    pairs; truly ubiquitous frames — intros, black frames — are the
    ``max_df``-style cutoff lever if they ever dominate). Returns
    (id_a, id_b, n_shared)."""
    h = frames.select(
        F.col(id_col).alias("_id"), F.md5(F.col(frame_col)).alias("_h")
    ).distinct()
    a = h.select(F.col("_id").alias("id_a"), "_h")
    b = h.select(F.col("_id").alias("id_b"), "_h")
    return (
        a.join(b, "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
