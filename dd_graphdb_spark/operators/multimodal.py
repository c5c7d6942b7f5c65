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

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

class FakeKernelWarning(UserWarning):
    """Raised (as a warning) when a multimodal operator falls back to
    its deterministic FAKE kernel because the codec library is absent.
    A user must never mistake fake dims/pixels for real decode output;
    the docstring note alone was too quiet (VERDICT r6)."""


def _warn_fake(op: str, lib: str) -> None:
    import warnings

    warnings.warn(
        f"{op}: {lib} is not installed — running the DETERMINISTIC FAKE "
        f"kernel (outputs are size-derived, NOT decoded pixels). Install "
        f"{lib} for real decoding.",
        FakeKernelWarning,
        stacklevel=3,
    )


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


DECODE_SCHEMA = "id long, height int, width int, channels int"


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode → (id, height, width, channels) over (id, payload
    BINARY). The Arrow mapInPandas plumbing (schema, batch shape,
    partition behavior) is real; the pixel kernel is swapped by
    availability:

    - with PIL installed, payloads decode for real;
    - in this container (no codec libraries — per the brief) a CLEARLY
      MARKED DETERMINISTIC FAKE derives dims from the byte length
      (h = 1 + 7n mod 64, w = 1 + 13n mod 64, 3 channels), so the stage
      is runnable and oracle-checkable end-to-end.
    """
    try:  # pragma: no cover - codec libs absent in this container
        import io

        from PIL import Image  # noqa: F401

        def kernel(b: bytes) -> tuple[int, int, int]:
            img = Image.open(io.BytesIO(b))
            return img.height, img.width, len(img.getbands())

    except ImportError:
        _warn_fake("decode_image", "Pillow")

        def kernel(b: bytes) -> tuple[int, int, int]:
            # DETERMINISTIC FAKE (no codecs in container): dims from size
            n = len(b)
            return 1 + (n * 7) % 64, 1 + (n * 13) % 64, 3

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            dims = [kernel(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "height": [d[0] for d in dims],
                    "width": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def resize_image(df: DataFrame, height: int, width: int, channels: int = 3) -> DataFrame:
    """Resize → (id, payload BINARY, height, width): output payload is
    exactly height·width·channels bytes. With Pillow installed, payloads
    decode and resample for real; otherwise the fake kernel
    tiles/truncates the source bytes to the target size (deterministic,
    size-contract-exact), keeping the downstream fixed-size-tensor
    contract testable."""
    import pandas as pd

    target = height * width * channels

    try:  # pragma: no cover - codec libs absent in this container
        import io

        from PIL import Image

        def kernel(b: bytes) -> bytes:
            img = Image.open(io.BytesIO(b)).convert("RGB" if channels == 3 else "L")
            raw = img.resize((width, height)).tobytes()
            return raw[:target].ljust(target, b"\x00")

    except ImportError:
        _warn_fake("resize_image", "Pillow")

        def kernel(b: bytes) -> bytes:
            # DETERMINISTIC FAKE: tile/truncate bytes to the target size
            b = b or b"\x00"
            reps = (target + len(b) - 1) // len(b)
            return (b * reps)[:target]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": [kernel(bytes(p)) for p in pdf["payload"]],
                    "height": height,
                    "width": width,
                }
            )

    return df.mapInPandas(batches, schema="id long, payload binary, height int, width int")


FEATURES_SCHEMA = "id long, n_bytes long, distinct_bytes long, mean_byte double"


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction → (id, n_bytes, distinct_bytes, mean_byte)
    over (id, payload BINARY). Unlike decode/resize this kernel needs no
    codec: content statistics are computed directly from the bytes
    (numpy over the Arrow batch), so the stage is REAL end-to-end — the
    shape a 100 TB pipeline uses for embedding/feature UDFs: one Arrow
    batch in, one fixed-width feature row per payload out, no shuffle.
    """
    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            n, d, m = [], [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                n.append(int(arr.size))
                d.append(int(np.unique(arr).size) if arr.size else 0)
                # floor(x*1e6+0.5)/1e6, not round(): integer-sum/size
                # means land on exact binary halves where Python rounds
                # half-even and DuckDB half-away — same explicit
                # arithmetic as the oracle
                m.append(
                    math.floor(float(arr.mean()) * 1e6 + 0.5) / 1e6
                    if arr.size else 0.0
                )
            yield pd.DataFrame(
                {"id": pdf["id"], "n_bytes": n, "distinct_bytes": d, "mean_byte": m}
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2, frame_bytes: int = 128) -> DataFrame:
    """Video frame sampling → (id, frame_idx, frame_digest): the payload
    is treated as a stream of fixed-size frames and every ``every_n``-th
    frame is emitted with its digest. Real containers need ffmpeg
    bindings; fixed-byte framing is the deterministic stand-in — the
    fan-out shape (one input row → many frame rows) is the real contract
    a 100 TB video pipeline needs from this stage."""
    import hashlib

    import pandas as pd

    _warn_fake("sample_frames", "an ffmpeg binding (e.g. PyAV)")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, digests = [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                b = bytes(p)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    digests.append(
                        hashlib.md5(b[fi * frame_bytes : (fi + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_digest": digests})

    return df.mapInPandas(batches, schema="id long, frame_idx int, frame_digest string")
