"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with a typed metadata struct —
the lakehouse-standard layout (one row per asset, bytes inline for small
assets or a URI for large ones). Decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages: the Spark-side
contract (schema, batch iteration, partition sizing) is real and tested;
the codec call itself is STUBBED because no image/audio library exists in
this container — `decode_fn=None` raises NotImplementedError at the point
a real codec would plug in, and tests use a deterministic fake.

Scale notes: binary payloads make wide rows — `maxPartitionBytes` governs
scan parallelism, and mapInPandas keeps peak memory at one Arrow batch per
worker. No shuffle is introduced by any stage here.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried beside every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image/png"
) -> DataFrame:
    """Derive the metadata struct from a binary payload column — native
    expressions only (length/sha2 run JVM-side)."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(p).cast("long").alias("n_bytes"),
            F.lower(F.sha2(p, 256)).alias("sha256"),
        ),
    )


def decode_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract stage over `mapInPandas`.

    ``decode_fn`` maps raw bytes → feature vector. With None the stage
    raises NotImplementedError where a real codec (PIL/ffmpeg/torchaudio)
    would be invoked — the surrounding plumbing (Arrow batching, schema,
    column pruning) is the part this engine owns and tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn is None:
                raise NotImplementedError(
                    "no media codec available in this environment; supply "
                    "decode_fn (e.g. PIL-based) to decode real payloads"
                )
            feats = pdf[payload_col].map(lambda b: list(decode_fn(bytes(b))))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf.get("media_type", pd.Series(["unknown"] * len(pdf))),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    cols = [id_col, payload_col] + (["media_type"] if "media_type" in df.columns else [])
    return df.select(*cols).mapInPandas(run, FEATURE_SCHEMA)


def pil_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Real image codec for the `decode_features` seam, used when Pillow
    is importable: decode, downscale to 16x16 grayscale, luminance
    histogram over ``dim`` bins, normalized — same output contract
    (list[float] of length dim) as `fake_decode`."""
    from io import BytesIO

    from PIL import Image  # noqa: F401 — optional dependency

    img = Image.open(BytesIO(payload)).convert("L").resize((16, 16))
    counts = [0] * dim
    for px in img.getdata():
        counts[px * dim // 256] += 1
    total = 16 * 16
    return [c / total for c in counts]


def default_decode() -> Callable[[bytes], list[float]] | None:
    """The best codec this environment offers: PIL-backed when Pillow is
    importable, else None (callers fall back to `fake_decode` for tests
    or get NotImplementedError on real payloads)."""
    try:
        import PIL  # noqa: F401

        return pil_decode
    except ImportError:
        return None


def fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in codec: byte-value histogram over ``dim``
    equal bins, normalized — stable across runs/engines, no library
    needed. Used by tests to exercise the mapInPandas contract."""
    counts = [0] * dim
    for byte in payload:
        counts[byte * dim // 256] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id", frame_col: str = "frame_idx"
) -> DataFrame:
    """Frame-sampling plumbing for video rows exploded to frames: keep
    every n-th frame — pure relational filter (the decode of kept frames
    happens in `decode_features`)."""
    return df.filter((F.col(frame_col) % every_n) == 0)
