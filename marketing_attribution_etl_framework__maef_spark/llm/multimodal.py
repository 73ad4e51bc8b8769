"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, and Arrow-batched feature extraction via ``mapInPandas``.

The Spark-side contract is fully real — explicit schemas, binary
columns, partition-preserving batch iteration, bounded batch sizes via
``spark.sql.execution.arrow.maxRecordsPerBatch`` — while the actual
codec step is stubbed: image/audio decoding libraries are not
available in this container, so ``decode_payload`` raises
``NotImplementedError`` unless the deterministic fake decoder is
selected. Swapping in a real decoder (PIL / torchaudio / pyav) changes
one function, none of the Spark plumbing.

Scale notes: feature extraction is the one place Python touches rows,
so it is Arrow-batched (``mapInPandas``), embarrassingly parallel, and
emits fixed-width vectors — at 100 TB the binary column stays in
parquet (never shuffled), and only the extracted features (tiny) flow
into downstream joins/dedup/ANN.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stand-in media table: the document text UTF-8-encoded as the
    opaque payload (the harness ships no real image bytes), plus the
    typed metadata a real pipeline carries — media type, byte length,
    content digest. Everything here is native column algebra."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
    )


def decode_payload(payload: bytes, media_type: str, fake: bool = False) -> list[float]:
    """Decode one payload into a FEATURE_DIM feature vector.

    STUB: real decoding needs codec libraries (PIL / soundfile / pyav)
    that are not installed here. ``fake=True`` selects a deterministic
    stand-in — mean/spread statistics over fixed byte stripes — so the
    batching plumbing is testable end to end."""
    if not fake:
        raise NotImplementedError(
            f"no codec available for {media_type}; install a decoder or use fake=True"
        )
    if not payload:
        return [0.0] * FEATURE_DIM
    stripe = max(len(payload) // FEATURE_DIM, 1)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = payload[i * stripe : (i + 1) * stripe] or payload[-stripe:]
        feats.append(sum(chunk) / (255.0 * len(chunk)))
    return feats


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame,
    features are computed per row, and only (id, metadata, features)
    leaves Python — the payload never round-trips back to the JVM."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_payload(p, m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


STRIPE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("stripe", T.LongType(), False),
        T.StructField("n_stripe_bytes", T.LongType(), False),
        T.StructField("sum_bytes", T.LongType(), False),
    ]
)


def stripe_sums(media: DataFrame, n_stripes: int = 8) -> DataFrame:
    """Integer byte-stripe summary via ``mapInPandas`` — the
    oracle-checkable face of the feature extractor: the identical Arrow
    batch plumbing over the binary column (payload enters Python,
    never returns to the JVM), but the output is exact integers
    (per-stripe byte count and byte sum, stripe length = ceil(n /
    n_stripes)), so a SQL oracle can value-check the whole mapInPandas
    path — no float features, no rounding cliffs. Rows are emitted
    only for non-empty stripes."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = ("doc_id", "media_type", "stripe", "n_stripe_bytes", "sum_bytes")
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    continue
                stripe_len = -(-n // n_stripes)  # ceil
                for i in range(n_stripes):
                    start = i * stripe_len
                    if start >= n:
                        break
                    chunk = b[start : start + stripe_len]
                    rows["doc_id"].append(did)
                    rows["media_type"].append(mt)
                    rows["stripe"].append(i)
                    rows["n_stripe_bytes"].append(len(chunk))
                    rows["sum_bytes"].append(sum(chunk))
            yield pd.DataFrame(rows).astype(
                {"doc_id": "int64", "stripe": "int64", "n_stripe_bytes": "int64", "sum_bytes": "int64"}
            )

    return media.mapInPandas(run, schema=STRIPE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), False),
    ]
)


def resize_payload(
    payload: bytes, width: int, height: int, fake: bool = False
) -> list[float]:
    """Resize one image payload to width x height grayscale pixels.

    STUB: a real implementation decodes with PIL/opencv and resamples;
    neither is installed here. ``fake=True`` maps byte stripes onto the
    target grid deterministically so the batching plumbing and output
    shape are real and testable."""
    if not fake:
        raise NotImplementedError("no image codec available; use fake=True or install PIL")
    n = width * height
    if not payload:
        return [0.0] * n
    stripe = max(len(payload) // n, 1)
    out = []
    for i in range(n):
        chunk = payload[i * stripe : (i + 1) * stripe] or payload[-stripe:]
        out.append(sum(chunk) / (255.0 * len(chunk)))
    return out


def resize_images(
    media: DataFrame, width: int = 4, height: int = 4, fake: bool = True
) -> DataFrame:
    """Arrow-batched resize over image-typed payloads: fixed output
    shape (width x height grayscale in [0,1]), payloads never return
    to the JVM — only the resized grid does."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mask = pdf["media_type"] == "image/png"
            sub = pdf[mask]
            yield pd.DataFrame(
                {
                    "doc_id": sub["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": [
                        resize_payload(p, width, height, fake=fake) for p in sub["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Deterministic frame sampling for video-typed payloads: slice
    ``n_frames`` evenly spaced byte windows (a real pipeline would seek
    keyframes; offsets and output shape are identical). Pure column
    algebra — no Python."""
    vids = media.filter(F.col("media_type") == "video/mp4")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    offsets = F.transform(
        idx, lambda i: (i * F.greatest((F.col("n_bytes") - frame_bytes) / n_frames, F.lit(0))).cast("long") + 1
    )
    ex = vids.select(
        "doc_id", "payload", "n_bytes", F.posexplode(offsets).alias("frame_no", "off")
    )
    return ex.select(
        "doc_id",
        "frame_no",
        F.expr(f"substr(payload, CAST(off AS INT), {frame_bytes})").alias("frame"),
    )
