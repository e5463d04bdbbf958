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
import struct
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


BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def bmp_stride(width: int, bpp: int = 24) -> int:
    """BMP rows are padded to 4-byte boundaries."""
    return ((width * (bpp // 8) + 3) // 4) * 4


def encode_bmp(width: int, height: int, pixel_byte: int) -> bytes:
    """Minimal real 24-bit uncompressed BMP (stdlib-only): standard
    file + info headers, rows padded to 4 bytes, solid pixel fill.
    Fixture generator for the real-decode round trip."""
    stride = bmp_stride(width)
    data_size = stride * height
    file_header = b"BM" + struct.pack(
        "<IHHI", BMP_HEADER_BYTES + data_size, 0, 0, BMP_HEADER_BYTES
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes([pixel_byte % 256]) * data_size


def decode_bmp(payload: bytes) -> dict:
    """REAL decoder for uncompressed BMP: parses the actual header bytes
    (no image library needed — the format is a fixed-layout struct).
    Feature = first FEATURE_DIM pixel-data bytes scaled to [0,1].

    Raises ValueError for payloads whose pixel data is shorter than the
    header's declared dimensions — a truncated blob is corrupt input and
    must hit the quarantine path, not flow downstream half-read."""
    if payload[:2] != b"BM" or len(payload) < BMP_HEADER_BYTES:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp % 8 == 0 and bpp > 0:
        expected = data_offset + bmp_stride(abs(width), bpp) * abs(height)
        if len(payload) < expected:
            raise ValueError(
                f"truncated BMP: header declares {abs(width)}x{abs(height)}@{bpp}bpp"
                f" ({expected} bytes) but payload is {len(payload)} bytes"
            )
    pix = payload[data_offset : data_offset + FEATURE_DIM]
    feature = [b / 255.0 for b in pix] + [0.0] * (FEATURE_DIM - len(pix))
    return {
        "width": abs(width),
        "height": abs(height),  # negative height = top-down row order
        "n_frames": 1,
        "feature": feature,
        "bpp": bpp,
    }


def decode_ppm(payload: bytes) -> dict:
    """REAL decoder for binary PPM (P6): whitespace-separated ASCII header
    `P6 <width> <height> <maxval>` then raw RGB bytes."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        fields.append(payload[start:i])
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    width, height = int(fields[0]), int(fields[1])
    pix = payload[i + 1 : i + 1 + FEATURE_DIM]
    feature = [b / 255.0 for b in pix] + [0.0] * (FEATURE_DIM - len(pix))
    return {"width": width, "height": height, "n_frames": 1, "feature": feature}


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload to (width, height, feature vector).

    REAL for the two stdlib-parseable uncompressed formats (BMP, P6 PPM) —
    those parse the actual bytes. Compressed formats (PNG/JPEG) need
    PIL/libvips, absent in this environment: with fake=True a deterministic
    stand-in derives metadata purely from the bytes, keeping the
    distributed plumbing exercisable end-to-end; otherwise raise.
    """
    if not fake:
        if payload[:2] == b"BM":
            out = decode_bmp(payload)
            out.pop("bpp", None)
            return out
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        raise NotImplementedError(
            "compressed image decoding requires PIL/libvips, "
            "not available in this environment (BMP/P6 decode natively)"
        )
    # fake=True: deterministic stand-in, even for payloads that happen to
    # start with a real magic — keeps the fake family's semantics uniform
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


def extract_media_metadata(
    media: "DataFrame", fake: bool = True, on_error: str = "raise"
) -> "DataFrame":
    """media(media_id, payload, media_type) -> typed metadata + feature.

    Arrow-batched; one output row per input row; payload never leaves the
    UDF (downstream shuffles carry only metadata).

    on_error: 'raise' (default — a corrupt payload fails the job loudly,
    the oracle-checked semantics) or 'skip' (quarantine: corrupt payloads
    are dropped, mirroring the parse stage's corrupt-page handling — the
    right mode for a real crawl where a few truncated blobs must not kill
    a 100 TB job). NotImplementedError (missing codec) always raises —
    that is a configuration problem, not a data problem.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                blob = bytes(payload) if payload is not None else b""
                try:
                    if mtype == "image":
                        meta = decode_image(blob, fake=fake)
                    else:
                        meta = decode_av(blob, mtype, fake=fake)
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
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
                    # ascii index (not packed bytes): NUL-free, so any SQL
                    # engine's varchar sha256 reproduces the frame hash
                    fd = hashlib.sha256(blob + str(idx).encode()).digest()
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


def media_bmp_from_documents(documents: "DataFrame") -> "DataFrame":
    """Deterministic REAL-format media table: one valid 24-bit BMP per doc,
    dimensions derived from doc_id (width 1+id%64, height 1+id%48), solid
    fill id%256. Exercises the real decode path end-to-end: the decoder
    reads these actual header bytes, and an independent SQL oracle can
    recompute width/height/n_bytes from doc_id arithmetic."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "payload": [
                        encode_bmp(1 + i % 64, 1 + i % 48, i % 256) for i in ids
                    ],
                    "media_type": ["image"] * len(ids),
                }
            )

    return documents.select("doc_id").mapInPandas(run, schema=MEDIA_SCHEMA)


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


def resize_bmp(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resize for uncompressed 24-bit BMP payloads:
    samples src pixels at round-half-down grid positions and re-emits a
    valid BMP. The kernel is a numpy gather (frombuffer → stride reshape →
    fancy-index precomputed sy/sx grids) — one vectorized copy per image,
    no per-pixel Python, so 224×224 crops over millions of images stay
    Arrow-batch-bound rather than interpreter-bound.

    Raises ValueError for truncated payloads (pixel data shorter than the
    declared dimensions) so quarantine mode drops them instead of silently
    emitting a short, internally inconsistent output."""
    if payload[:2] != b"BM" or len(payload) < BMP_HEADER_BYTES:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    top_down = height < 0  # row order preserved; output header keeps the sign
    width, height = abs(width), abs(height)
    src_stride = bmp_stride(width)
    if len(payload) < data_offset + src_stride * height:
        raise ValueError(
            f"truncated BMP: header declares {width}x{height} "
            f"({data_offset + src_stride * height} bytes) but payload is "
            f"{len(payload)} bytes"
        )
    dst_stride = bmp_stride(target_w)
    import numpy as np

    src = np.frombuffer(
        payload, dtype=np.uint8, count=src_stride * height, offset=data_offset
    ).reshape(height, src_stride)
    sy = (np.arange(target_h, dtype=np.int64) * height) // target_h
    sx = (np.arange(target_w, dtype=np.int64) * width) // target_w
    # byte columns of the sampled pixel triples, in row order
    cols = (sx[:, None] * 3 + np.arange(3, dtype=np.int64)[None, :]).reshape(-1)
    out = np.zeros((target_h, dst_stride), dtype=np.uint8)
    out[:, : target_w * 3] = src[sy][:, cols]
    data = out.tobytes()
    file_header = b"BM" + struct.pack(
        "<IHHI", BMP_HEADER_BYTES + len(data), 0, 0, BMP_HEADER_BYTES
    )
    out_h = -target_h if top_down else target_h
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, target_w, out_h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    media: "DataFrame",
    target_w: int | None = 8,
    target_h: int | None = 8,
    on_error: str = "raise",
) -> "DataFrame":
    """Batch image resize over mapInPandas: one resized BMP per input image
    row (non-image rows are dropped). target_w/target_h None = halve the
    source dimensions (floor, min 1). The payload column is re-emitted here
    by necessity — the resized image IS the product — but it is the SMALL
    post-resize blob (target dims), so downstream stages shuffle thumbnails,
    not originals. on_error: as in extract_media_metadata ('skip' drops
    undecodable payloads instead of failing the job)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image":
                    continue
                src = bytes(payload)
                try:
                    if target_w is None or target_h is None:
                        # each None axis halves independently; a given axis
                        # is honored as-is (fixed width + auto height)
                        hdr = decode_bmp(src)
                        tw = (
                            target_w
                            if target_w is not None
                            else max(1, hdr["width"] // 2)
                        )
                        th = (
                            target_h
                            if target_h is not None
                            else max(1, hdr["height"] // 2)
                        )
                    else:
                        tw, th = target_w, target_h
                    blob = resize_bmp(src, tw, th)
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
                out.append(
                    {
                        "media_id": int(mid),
                        "payload": blob,
                        "width": tw,
                        "height": th,
                        "n_bytes": len(blob),
                    }
                )
            if out:
                o = pd.DataFrame(out)
                o["media_id"] = o["media_id"].astype("Int64")
                o["width"] = o["width"].astype("Int32")
                o["height"] = o["height"].astype("Int32")
                o["n_bytes"] = o["n_bytes"].astype("Int64")
                yield o[[f.name for f in RESIZED_SCHEMA.fields]]

    pruned = media.select("media_id", "payload", "media_type")
    return pruned.mapInPandas(run, schema=RESIZED_SCHEMA)
