"""Multimodal columns: opaque binary payloads + typed metadata.

Mirrors how a 100 TB training-data lake carries images/audio/video:
an opaque ``binary`` column plus a metadata struct, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing — schema, batch shape,
partition behavior — is real and tested; the actual codec calls are
STUBBED (this container has no PIL/ffmpeg): ``decode_image`` raises
``NotImplementedError`` unless a decoder import succeeds, and
:func:`extract_features` uses a deterministic byte-level fake
(length/header/md5-checksum) so pipelines are end-to-end testable and
oracle-checkable.

The reference analog: OCR page payloads are exactly such opaque
documents — fetched as bytes (app/process/dspace.go:72-90), sniffed by
header (app/process/formats.go:34-52), transformed, and stored; our
``media_kind`` sniff reproduces the header-sniff idea on binary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),
                    T.StructField("declared_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("header_byte", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("kind_sniffed", T.StringType(), False),
    ]
)

# header magic -> kind (the formats.go:34-52 sniff, binary flavor)
_MAGICS: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
)


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from ``documents``: the
    payload is the utf-8 text bytes prefixed with a magic chosen by
    doc_id % len(magics) — stands in for real blobs with zero external
    data, and every downstream feature is SQL-recomputable."""
    magic = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(b"\x89PNG"))
        .when(F.col("doc_id") % 4 == 1, F.lit(b"\xff\xd8\xff"))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b"ID3"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(magic, F.col(text_col).cast("binary")).alias("payload"),
        F.struct(
            F.lit("synthetic").alias("kind"),
            F.length(F.col(text_col)).cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def _sniff(payload: bytes) -> str:
    for magic, kind in _MAGICS:
        if payload[: len(magic)] == magic:
            return kind
    return "application/octet-stream"


def decode_image(payload: bytes):  # pragma: no cover - env-gated
    """Real decode path — requires an image library the sandbox lacks.
    Pipelines call extract_features() which never needs it."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL; sandbox ships none (stubbed per spec)"
        ) from e


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic stand-ins for decode-derived features: byte length,
    first payload byte, md5 checksum, sniffed kind. Real decoders slot
    into the same mapInPandas without touching the plan shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [],
                "n_bytes": [],
                "header_byte": [],
                "checksum": [],
                "kind_sniffed": [],
            }
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                p = bytes(payload) if payload is not None else b""
                rows["media_id"].append(mid)
                rows["n_bytes"].append(len(p))
                rows["header_byte"].append(p[0] if p else None)
                rows["checksum"].append(hashlib.md5(p).hexdigest())
                rows["kind_sniffed"].append(_sniff(p))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, factor: int = 4) -> DataFrame:
    """'Resize' plumbing: emit a payload downsampled by keeping every
    ``factor``-th byte — the plan shape of an image-resize stage
    (binary in, smaller binary + new dims out) with a deterministic
    byte-stride fake where a real resampler would run. Schema,
    batching, and size accounting are real and oracle-checkable
    (out_bytes = ceil(n_bytes / factor))."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload_small", T.BinaryType(), False),
            T.StructField("in_bytes", T.LongType(), False),
            T.StructField("out_bytes", T.LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload_small": [], "in_bytes": [], "out_bytes": []}
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                p = bytes(payload) if payload is not None else b""
                small = p[::factor]
                rows["media_id"].append(mid)
                rows["payload_small"].append(small)
                rows["in_bytes"].append(len(p))
                rows["out_bytes"].append(len(small))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(gen, schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled
    offset with a per-frame checksum — the video-frame-extraction plan
    shape (explode along a stride) with a byte-stride fake."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("frame_checksum", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "offset": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                p = bytes(payload) if payload is not None else b""
                for i, off in enumerate(range(0, len(p), every_n_bytes)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["offset"].append(off)
                    rows["frame_checksum"].append(
                        hashlib.md5(p[off : off + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(gen, schema)
