"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
`mapInPandas`.

The decode/feature-extraction kernels are STUBBED (this container ships no
image/audio libraries): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (derived purely
from the bytes) stands in. The Spark-side plumbing — schema, batch shape,
partitioning, UDF signature — is real and tested; swapping in PIL/ffmpeg
later changes only the kernel body.

At 100 TB: binary payloads dominate row size, so the stage (a) prunes to
exactly (id, payload) before the UDF, (b) relies on small Arrow batches
(session.py) to bound executor memory, and (c) emits compact metadata rows
so everything downstream shuffles kilobytes, not blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload to (width, height, feature vector).

    STUB: real decoding needs PIL/libvips (absent here). With fake=True a
    deterministic stand-in derives metadata purely from the bytes, keeping
    the distributed plumbing exercisable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libvips, not available in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 16 + digest[0] % 240,
        "height": 16 + digest[1] % 240,
        "n_frames": 1,
        "feature": [digest[i] / 255.0 for i in range(FEATURE_DIM)],
    }


def decode_av(payload: bytes, media_type: str, fake: bool = False) -> dict:
    """STUB decoder for audio/video: frame/sample counts + pooled feature."""
    if not fake:
        raise NotImplementedError(
            "audio/video decoding requires ffmpeg, not available in this environment"
        )
    digest = hashlib.sha256(payload).digest()
    return {
        "width": 0 if media_type == "audio" else 16 + digest[2] % 240,
        "height": 0 if media_type == "audio" else 16 + digest[3] % 240,
        "n_frames": 1 + digest[4] % 120,
        "feature": [digest[8 + i] / 255.0 for i in range(FEATURE_DIM)],
    }


def extract_media_metadata(media: "DataFrame", fake: bool = True) -> "DataFrame":
    """media(media_id, payload, media_type) -> typed metadata + feature.

    Arrow-batched; one output row per input row; payload never leaves the
    UDF (downstream shuffles carry only metadata).
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                blob = bytes(payload) if payload is not None else b""
                if mtype == "image":
                    meta = decode_image(blob, fake=fake)
                else:
                    meta = decode_av(blob, mtype, fake=fake)
                out.append(
                    {
                        "media_id": int(mid),
                        "media_type": mtype,
                        "n_bytes": len(blob),
                        "content_sha": hashlib.sha256(blob).hexdigest(),
                        **meta,
                    }
                )
            if out:
                o = pd.DataFrame(out)
                o["media_id"] = o["media_id"].astype("Int64")
                o["n_bytes"] = o["n_bytes"].astype("Int64")
                o["width"] = o["width"].astype("Int32")
                o["height"] = o["height"].astype("Int32")
                o["n_frames"] = o["n_frames"].astype("Int32")
                yield o[[f.name for f in META_SCHEMA.fields]]

    pruned = media.select("media_id", "payload", "media_type")
    return pruned.mapInPandas(run, schema=META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
        T.StructField("frame_feature", T.ArrayType(T.FloatType())),
    ]
)


def sample_frames(
    media: "DataFrame", every_n: int = 10, fake: bool = True
) -> "DataFrame":
    """Frame sampling for video payloads: one output row per sampled frame
    (frames 0, every_n, 2*every_n, ... of the decoded stream).

    STUB decode (as with decode_av): the frame content is a deterministic
    function of (payload bytes, frame index). The Spark shape is the real
    one — explode-like fan-out inside the UDF, bounded output rows per
    input row, payload never re-emitted."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                blob = bytes(payload) if payload is not None else b""
                meta = decode_av(blob, "video", fake=fake)
                for idx in range(0, meta["n_frames"], every_n):
                    fd = hashlib.sha256(blob + idx.to_bytes(4, "big")).digest()
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": idx,
                            "frame_sha": fd.hex(),
                            "frame_feature": [fd[i] / 255.0 for i in range(FEATURE_DIM)],
                        }
                    )
            if out:
                o = pd.DataFrame(out)
                o["media_id"] = o["media_id"].astype("Int64")
                o["frame_idx"] = o["frame_idx"].astype("Int32")
                yield o[[f.name for f in FRAME_SCHEMA.fields]]

    pruned = media.select("media_id", "payload", "media_type")
    return pruned.mapInPandas(run, schema=FRAME_SCHEMA)


def media_from_documents(documents: "DataFrame") -> "DataFrame":
    """Deterministic fake media table: each document's utf-8 bytes act as
    an opaque payload (media_type cycles by doc_id). Lets the multimodal
    plumbing run on driver testdata with zero external files."""
    from pyspark.sql import functions as F

    mtype = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        mtype.alias("media_type"),
    )
