"""Multimodal-column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched operators.

Image decode is REAL without any image library: ``header_decode`` parses
PNG/JPEG/GIF dimensions+channels from header bytes in pure Python
(Pillow takes over automatically when importable, extending format
coverage). Only the model-based feature extraction remains a
deterministic stand-in (no vision/audio model runtime in this
container); everything around it — schema, batch iteration,
partitioning, UDF signatures — is real and tested, so swapping in a
model runtime is a one-function change on a cluster that has it.

Scale notes: binary payloads ride in parquet as byte arrays; operators
are narrow maps over Arrow batches (mapInPandas), so a 100 TB media
table processes with zero shuffles, bounded executor memory (batch
size), and column pruning still applies to the metadata columns.
"""

from __future__ import annotations

from collections.abc import Iterator
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, mime string, byte_len long"
)


def attach_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo media table: utf-8 bytes of the text as the opaque payload +
    typed metadata columns. In production this is the parquet schema of
    the ingested media table."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("byte_len"),
    )


def binary_meta(df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Pure-JVM metadata over a binary column: exact byte length, md5
    digest, hex prefix. No Python involved — this is the fast path for
    dedup/indexing of media payloads."""
    return df.select(
        F.col(id_col),
        F.length(bin_col).cast("long").alias("byte_len"),
        F.md5(F.col(bin_col)).alias("content_md5"),
        F.substring(F.hex(F.col(bin_col)), 1, 16).alias("hex_prefix"),
    )


def sql_binary_meta(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """Oracle for binary_meta(attach_binary(documents)): DuckDB encode()
    produces the same utf-8 bytes; md5(VARCHAR) hashes those same bytes
    (DuckDB has no md5(BLOB)); hex agrees after upper()."""
    return f"""
        SELECT {id_col},
               CAST(octet_length(encode({text_col})) AS BIGINT) AS byte_len,
               md5({text_col}) AS content_md5,
               upper(substr(hex(encode({text_col})), 1, 16)) AS hex_prefix
        FROM {table}
    """


# --------------------------------------------------------------------- #
# Decode / feature-extract (Arrow-batched; decoder stubbed)
# --------------------------------------------------------------------- #


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'image decode': derives (width, height,
    channels) from a crc of the bytes. Stands in for PIL.Image.open."""
    crc = zlib.crc32(payload)
    return (16 + crc % 240, 16 + (crc >> 8) % 240, 1 + (crc >> 16) % 4)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real image decode via Pillow (header parse only — ``Image.open``
    is lazy, so this reads dimensions without decompressing pixels)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return (im.width, im.height, len(im.getbands()))


# PNG color type -> sample count (PNG spec §11.2.2 IHDR)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG start-of-frame markers (ITU T.81 table B.1): every SOFn except
# C4/C8/CC (those are DHT/JPG/DAC, not frames)
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def header_decode(payload: bytes) -> tuple[int, int, int]:
    """Dependency-free (width, height, channels) from PNG / JPEG / GIF
    header bytes — pure-Python struct parsing, no Pillow, no pixel
    decompression. This is the real decode branch that runs in
    containers without image libraries; formats beyond these three raise
    a loud ValueError (extend here, or install Pillow for full coverage).
    """
    b = payload
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandated first: length(4) type(4) at offset 8, then
        # width/height as big-endian u32, bit depth, color type
        if len(b) < 26 or b[12:16] != b"IHDR":
            raise ValueError("corrupt PNG: IHDR not first chunk")
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        color_type = b[25]
        if color_type not in _PNG_CHANNELS:
            raise ValueError(f"corrupt PNG: color type {color_type}")
        return (w, h, _PNG_CHANNELS[color_type])
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                raise ValueError("corrupt JPEG: lost marker sync")
            while i < len(b) and b[i] == 0xFF:  # fill bytes are legal
                i += 1
            marker = b[i]
            i += 1
            # standalone markers without a length field
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                continue
            seg_len = int.from_bytes(b[i : i + 2], "big")
            if marker in _JPEG_SOF:
                h = int.from_bytes(b[i + 3 : i + 5], "big")
                w = int.from_bytes(b[i + 5 : i + 7], "big")
                return (w, h, b[i + 7])
            i += seg_len
        raise ValueError("corrupt JPEG: no SOF marker before EOF")
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return (w, h, 3)  # palette entries are RGB triples
    raise ValueError(
        "unsupported image format (pure-Python header decode covers "
        "PNG/JPEG/GIF; install Pillow for other formats)"
    )


def decode_image(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Decode image payloads to (doc_id, width, height, channels).

    Decoder resolution (the scoped contract, also in README §Multimodal):

    - ``use_fake_decoder=True`` → the deterministic crc-derived fake
      (tests with arbitrary payload bytes).
    - otherwise, if Pillow is importable → real decode for any format
      PIL knows (lazy header parse; pixels never decompressed).
    - otherwise → :func:`header_decode`, the dependency-free PNG/JPEG/GIF
      header parser — REAL decoding of real image bytes, runnable in
      this container and CI; unsupported formats fail loudly per-row.

    The Spark-side plumbing (Arrow batches in, typed rows out, column
    pruning to (id, payload)) is identical in all three cases — swapping
    decoders changes one row-level function, nothing about the plan."""
    decode = (
        _fake_decode
        if use_fake_decoder
        else (_pil_decode if _pil_available() else header_decode)
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            decoded = [decode(bytes(p)) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        batches, schema=f"{id_col} long, width int, height int, channels int"
    )


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """'Video' frame sampling: emit n deterministic byte-slices per
    payload as (doc_id, frame_idx, frame_bytes). Real shape of a
    frame-sampling operator (row explosion inside Arrow batches with
    bounded memory); the slicing stands in for ffmpeg keyframe extraction.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[bin_col])
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    rows.append(
                        (int(r[id_col]), i, payload[i * step : i * step + step])
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_bytes"])

    return df.select(id_col, bin_col).mapInPandas(
        batches, schema=f"{id_col} long, frame_idx int, frame_bytes binary"
    )


def extract_features(
    df: DataFrame,
    dim: int = 16,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    use_fake_extractor: bool = False,
) -> DataFrame:
    """Feature extraction over binary payloads → ``array<float>``
    embedding column, Arrow-batched (mapInPandas). The model forward
    pass is STUBBED like the decoder (no vision/audio model in this
    container); the fake extractor is deterministic (per-payload seeded
    byte histogram, L2-normalized) so the OUTPUT feeds the repo's real
    ANN/near-dup operators end-to-end — the full multimodal pipeline
    (decode → featurize → dedup/search) minus only the model weights.

    Scale: narrow map, zero shuffles; batch size bounds executor memory;
    the embedding column then enters `functions.similarity` /
    `functions.ivf` exactly like the embeddings table does."""
    if not use_fake_extractor:
        raise NotImplementedError(
            "real feature extraction needs a vision/audio model runtime "
            "not present in this container; pass use_fake_extractor=True "
            "for the deterministic stand-in"
        )

    out_schema = f"{id_col} long, embedding array<float>"

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            embs = []
            for payload in pdf[bin_col]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                # deterministic "model": byte histogram folded to dim
                hist = np.bincount(b % dim, minlength=dim).astype("float32")
                n = float(np.linalg.norm(hist))
                embs.append((hist / n if n > 0 else hist).tolist())
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "embedding": embs}
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=out_schema)
