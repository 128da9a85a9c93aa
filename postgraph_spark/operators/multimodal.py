"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no multimodal surface (it is a Postgres graph
extension); this is an additive training-data-pipeline capability. The
data model follows the brief: media payloads are opaque ``binary``
columns with a typed ``meta`` struct, and every transformation is either
a pure Column expression (byte stats — codegen'd, no Python) or an
Arrow-batched ``mapInPandas`` pipeline (decode / feature-extract /
frame-sample) so the Python boundary is crossed once per batch, never
per row.

The actual codec step (JPEG decode, audio resample, video demux) needs
libraries not present in this container, so ``decode_payload`` is a
STUB: it tries the real libraries and otherwise produces a
deterministic fake "decode" derived from the payload bytes. Everything
Spark-side — schema, partitioning, UDF signatures, Arrow batch shape,
row expansion for frame sampling — is real and tested.

Scale notes: media tables at 100 TB are dominated by payload bytes.
``media_stats``/metadata queries never deserialize payloads into Python
(pure expressions over binary), and the mapInPandas stages are
embarrassingly parallel per input partition — no shuffle anywhere in
this module; partition count = input file splits.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

#: canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

MODALITIES = ["image", "audio", "video"]


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from the documents corpus.

    payload = utf-8 bytes of the text (an opaque blob as far as every
    operator here is concerned); modality round-robins by doc_id; meta is
    derived from the byte length the way a real ingest would read a
    container header. Pure projection — no shuffle, survives any scale.
    """
    n = F.length("text").cast("long")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            n.alias("n_bytes"),
            F.when(modality == "image", (n % 640 + 16).cast("int")).alias("width"),
            F.when(modality == "image", (n % 480 + 16).cast("int")).alias("height"),
            F.when(modality == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(modality == "video", (n % 24 + 1).cast("int")).alias("n_frames"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-modality byte statistics WITHOUT touching Python: payload stays
    a JVM binary, md5/length are codegen'd expressions. This is the query
    shape for '100 TB of blobs, give me corpus stats'."""
    return (
        media.select(
            "modality",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.md5("payload").alias("digest"),
        )
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
            F.count_distinct("digest").alias("n_unique"),
        )
    )


# ------------------------------------------------------------- decode stub


def decode_media(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Output: (media_id, modality, features array<double>, decode_ok).
    Falls back to the deterministic fake when codecs are unavailable, so
    the pipeline shape (batch iterator in, batch iterator out, payload
    column dropped on output to shed the heavy bytes) is fully exercised.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    # nested defs (not module refs) so cloudpickle ships them BY VALUE —
    # executor Python workers never need this package importable
    def try_real_decode(modality: str, payload: bytes):
        if modality == "image":
            import PIL.Image  # noqa: F401  (not installed here)
        elif modality == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
        raise NotImplementedError("real media decode not wired up in this container")

    def fake_decode(payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * n_features
        feats = []
        for i in range(n_features):
            stride = payload[i::n_features]
            feats.append(round(sum(stride) / max(len(stride), 1) / 255.0, 6))
        return feats

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats, oks = [], []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                try:
                    try_real_decode(modality, bytes(payload))
                    oks.append(True)  # pragma: no cover (no codecs here)
                except (ImportError, NotImplementedError):
                    oks.append(False)
                feats.append(fake_decode(bytes(payload)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(decode_batches, out_schema)


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: each video expands to up to
    ``max_frames`` rows of (media_id, frame_index, frame_payload) — the
    1-row-in/N-rows-out mapInPandas shape a real demuxer would use.

    The stub 'demuxer' slices the payload into meta.n_frames equal chunks
    and emits every ceil(n_frames/max_frames)-th chunk — deterministic,
    so the oracle can reproduce it with substr arithmetic.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def demux(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                payload = bytes(payload)
                n = int(n_frames)
                if n <= 0 or not payload:
                    continue
                size = max(len(payload) // n, 1)
                step = -(-n // max_frames)  # ceil
                for i in range(0, n, step):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * size : (i + 1) * size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    videos = media.filter(F.col("modality") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return videos.mapInPandas(demux, out_schema)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing: real signature, stubbed pixel work.

    A real implementation decodes, resamples, re-encodes inside the same
    Arrow batch loop; the stub rewrites meta (exact) and passes the
    payload through, keeping schema + batch shape production-true.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BooleanType()),
        ]
    )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            try:
                import PIL.Image  # noqa: F401

                resized = True  # pragma: no cover (no codecs here)
            except ImportError:
                resized = False
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],
                    "width": width,
                    "height": height,
                    "resized": resized,
                }
            )

    images = media.filter(F.col("modality") == "image").select("media_id", "payload")
    return images.mapInPandas(resize, out_schema)
