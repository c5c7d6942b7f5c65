"""Multimodal binary plumbing: metadata, decode (fake kernel), resize
size contract, frame-sampling fan-out (operators/multimodal.py)."""

from pyspark.sql import functions as F

import dd_graphdb_spark.operators.multimodal as M


def _payloads(spark):
    df = spark.createDataFrame(
        [(1, "a" * 300), (2, "xy"), (3, "b" * 129)], "doc_id long, text string"
    )
    return M.to_binary_column(df, "text", "doc_id")


def test_metadata_and_magic(spark):
    png = spark.createDataFrame([(9, bytearray(b"\x89PNG\r\n\x1a\nrest"))], "id long, payload binary")
    meta = {r["id"]: r for r in M.extract_metadata(png).collect()}
    assert meta[9]["content_type"] == "image/png"
    assert meta[9]["n_bytes"] == 12


def test_decode_fake_dims(spark):
    rows = {r["id"]: r for r in M.decode_image(_payloads(spark)).collect()}
    assert rows[1]["height"] == 1 + (300 * 7) % 64
    assert rows[1]["width"] == 1 + (300 * 13) % 64
    assert rows[2]["channels"] == 3


def test_resize_size_contract(spark):
    out = M.resize_image(_payloads(spark), height=4, width=5, channels=3)
    rows = out.withColumn("n", F.length("payload")).collect()
    assert all(r["n"] == 4 * 5 * 3 for r in rows)
    assert all(r["height"] == 4 and r["width"] == 5 for r in rows)


def test_frame_sample_fanout(spark):
    out = M.sample_frames(_payloads(spark), every_n=2, frame_bytes=128)
    rows = sorted((r["id"], r["frame_idx"]) for r in out.collect())
    # doc1: 300B → 3 frames → idx 0, 2; doc2: 1 frame → 0; doc3: 129B → 2 frames → 0
    assert rows == [(1, 0), (1, 2), (2, 0), (3, 0)]


def test_fake_kernel_emits_warning(spark):
    """VERDICT r6 #4: the fake codec path must warn at runtime, not just
    in the docstring — a user must not mistake fake dims for real
    decode output. (Pillow/ffmpeg absent in this container, so the fake
    branch is the one taken.)"""
    import warnings

    for op in (
        lambda d: M.decode_image(d),
        lambda d: M.resize_image(d, height=2, width=2),
        lambda d: M.sample_frames(d),
    ):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            op(_payloads(spark))
        fake = [x for x in w if issubclass(x.category, M.FakeKernelWarning)]
        assert fake and "DETERMINISTIC FAKE" in str(fake[0].message)
