"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extraction kernels need codec libraries that are not
in this container — they are STUBBED behind ``NotImplementedError`` or a
deterministic fake, per the brief. What IS real and tested:
- the schema convention (payload BINARY + metadata struct),
- Arrow-batched ``mapInPandas`` plumbing (batch shape, schema, partition
  behavior),
- deterministic metadata extraction that doesn't need codecs
  (byte length, magic-byte sniffing, content digest).

Scale notes: binary payloads ride in parquet with the metadata columns;
filters on metadata prune row groups without touching payload bytes.
Decode UDFs receive Arrow record batches — at 100 TB the decode stage is
embarrassingly parallel and bounded by ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"OggS": "audio/ogg",
    b"\x1aE\xdf\xa3": "video/webm",
}

META_SCHEMA = "id long, n_bytes long, content_type string, digest string"


def to_binary_column(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Adapter used in tests: treat UTF-8 text bytes as an opaque payload
    so the binary plumbing is exercised without codec libraries."""
    return df.select(F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload"))


def extract_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas metadata pass over (id, payload BINARY): byte length,
    magic-byte content type, md5 digest. Arrow-batched; no decode."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = pdf["payload"]
            ctypes = []
            for p in payloads:
                b = bytes(p)
                ct = "application/octet-stream"
                for magic, t in MAGIC.items():
                    if b.startswith(magic):
                        ct = t
                        break
                ctypes.append(ct)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_type": ctypes,
                    "digest": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                }
            )

    return df.mapInPandas(batches, schema=META_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode → (id, height, width, channels). Requires an imaging
    library not present in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire the codec into a mapInPandas "
        "kernel with schema 'id long, height int, width int, channels int'"
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling stub — same contract as decode_image."""
    raise NotImplementedError("video frame sampling requires ffmpeg bindings")
