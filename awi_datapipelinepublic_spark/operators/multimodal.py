"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas UDFs over mapInPandas.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct alongside. The Spark-side contract — schema,
partition-sized Arrow batches, mapInPandas signature — is real and
tested; the default codec call is stubbed behind ``_decode_stub``
(image/audio libraries are not in this container) with a deterministic
fake so plumbing is verifiable end to end. One REAL format ships:
:func:`png_decoder` parses true PNG geometry (IHDR) with chunk CRC
verification using only the stdlib — drop it into the same
``decoder=`` seam. Swapping in PIL/torchaudio for other formats is a
one-function change; the distributed plan is identical.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounded when payloads are large (a 10 MB image × 10k default batch
would allocate 100 GB — set ~64-256 rows for media). Binary payloads
should be stored in their own parquet column so column pruning skips
them unless the decode stage runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, fake_width long, fake_height long, checksum long"
)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for an image decode (reference copy —
    the executing copy is the nested ``stub`` inside decode_media, kept
    self-contained for cloudpickle; keep the two in sync).

    A real deployment replaces this body with e.g.
    ``img = PIL.Image.open(io.BytesIO(payload))`` and returns real
    dimensions/features. The fake derives stable pseudo-dimensions
    from the byte length and a cheap checksum, so tests (and the
    DuckDB oracle) can verify the distributed plumbing produced
    exactly one correctly-shaped row per input.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": (n % 640) + 1,
        "fake_height": (n % 480) + 1,
        "checksum": sum(payload[:64]) if n else 0,
    }


PNG_SCHEMA = (
    "doc_id long, width long, height long, bit_depth long, "
    "color_type long, crc_ok long"
)


def png_decoder():
    """A REAL (non-stub) decoder for the :func:`decode_media` seam:
    pure-stdlib PNG header decode — signature check, IHDR
    width/height/bit-depth/color-type parse (struct), and a zlib.crc32
    verification of every chunk up to IEND. No image library needed;
    this is the PNG container format per the public W3C spec (8-byte
    signature, then length/type/data/crc chunks, IHDR first with
    13 bytes of big-endian geometry).

    Returns a SELF-CONTAINED closure (nested def → cloudpickled by
    value, runs on executors without this package on their
    PYTHONPATH — the decode_media contract). Non-PNG payloads yield
    the (-1, -1, -1, -1, 0) sentinel row rather than raising, so a
    mixed-mime corpus flows through one decode stage. Use with
    ``decode_media(df, decoder=png_decoder(), schema=PNG_SCHEMA)``.
    """

    def decode(payload: bytes) -> dict:
        import struct
        import zlib

        bad = {
            "width": -1,
            "height": -1,
            "bit_depth": -1,
            "color_type": -1,
            "crc_ok": 0,
        }
        if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
            return bad
        pos, out, crc_ok = 8, None, 1
        while pos + 12 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return bad
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                crc_ok = 0
            if ctype == b"IHDR":
                if length != 13:
                    return bad
                w, h, depth, color = struct.unpack(">IIBB", data[:10])
                out = {
                    "width": w,
                    "height": h,
                    "bit_depth": depth,
                    "color_type": color,
                }
            pos += 12 + length
            if ctype == b"IEND":
                break
        if out is None:
            return bad
        out["crc_ok"] = crc_ok
        return out

    return decode


GIF_SCHEMA = "doc_id long, width long, height long, n_colors long, animated long"


def gif_decoder():
    """Second real format for the :func:`decode_media` seam: pure-stdlib
    GIF header decode per the public GIF87a/89a spec — 6-byte
    signature, little-endian logical-screen width/height, global-
    color-table size from the packed flags byte, and an animation
    probe (more than one image separator ``0x2C`` at block level is
    approximated by counting graphic-control extensions). Nested def →
    cloudpickled by value (the decode_media contract). Non-GIF
    payloads yield the (-1, -1, -1, 0) sentinel."""

    def decode(payload: bytes) -> dict:
        import struct

        if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
            return {"width": -1, "height": -1, "n_colors": -1, "animated": 0}
        w, h, packed = struct.unpack("<HHB", payload[6:11])
        n_colors = 2 ** ((packed & 0x07) + 1) if packed & 0x80 else 0
        frames = payload.count(b"\x21\xf9")  # graphic control extensions
        return {
            "width": w,
            "height": h,
            "n_colors": n_colors,
            "animated": 1 if frames > 1 else 0,
        }

    return decode


WAV_SCHEMA = (
    "doc_id long, n_channels long, sample_rate long, bits_per_sample long, "
    "n_frames long"
)


def wav_decoder():
    """Audio-side real decoder for the seam: RIFF/WAVE header parse per
    the public WAV container spec — 'RIFF'+'WAVE' magic, then the
    'fmt ' chunk (channels, sample rate, bits/sample) and the 'data'
    chunk length → frame count. Walks chunks like the PNG decoder, so
    extra chunks (LIST, fact) are skipped correctly. Nested def —
    self-contained on executors. Non-WAV payloads yield the
    (-1, -1, -1, -1) sentinel."""

    def decode(payload: bytes) -> dict:
        import struct

        bad = {
            "n_channels": -1,
            "sample_rate": -1,
            "bits_per_sample": -1,
            "n_frames": -1,
        }
        if (
            len(payload) < 44
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"
        ):
            return bad
        pos, out, data_len = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                _, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
                out = {
                    "n_channels": ch,
                    "sample_rate": rate,
                    "bits_per_sample": bits,
                }
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen % 2)  # chunks are word-aligned
        if out is None or data_len is None:
            return bad
        bytes_per_frame = out["n_channels"] * max(out["bits_per_sample"] // 8, 1)
        out["n_frames"] = data_len // max(bytes_per_frame, 1)
        return out

    return decode


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture helper: synthesize a binary payload column from text
    (the testdata ships no media table). Production inputs arrive as
    real ``binary`` parquet columns with the same schema shape."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("orig_size"),
        ),
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
    schema: str = DECODED_SCHEMA,
) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas.

    One output row per input row; Arrow batches in, Arrow batches out.
    The iterator form processes a partition as a stream of batches —
    constant memory regardless of partition size.

    ``decoder`` is the real-codec seam: a ``bytes -> dict`` callable
    whose dict keys match ``schema`` (minus ``id_col``). Pass e.g.
    ``lambda p: pil_features(p)`` with
    ``schema="doc_id long, width long, height long, mode string"`` and
    the identical distributed plan runs the real codec — the default
    is the deterministic byte-length stub (this container ships no
    image/audio libraries) so plumbing stays oracle-verifiable. A
    decoder defined in an installed library is cloudpickled by
    reference (importable on workers); one defined in ``__main__`` or
    a notebook is pickled by value — both work, but the default stub
    stays a nested def so THIS package never needs to be importable on
    executors.

    The worker closure must be SELF-CONTAINED: a reference to a
    module-level helper is cloudpickled by module path, and executors'
    Python workers cannot import this package unless it is shipped
    (addPyFile / pip on the cluster) or on their PYTHONPATH — which a
    host application's session won't have. Nested def → pickled by
    value → runs anywhere.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stub(payload: bytes) -> dict:
            n = len(payload)
            return {
                "n_bytes": n,
                "fake_width": (n % 640) + 1,
                "fake_height": (n % 480) + 1,
                "checksum": sum(payload[:64]) if n else 0,
            }

        fn = decoder if decoder is not None else stub
        for pdf in batches:
            feats = [fn(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def resize_stub(df: DataFrame, width: int, height: int, payload_col: str = "payload") -> DataFrame:
    """Resize contract: payload → payload' plus updated metadata.

    Stubbed (no codec): truncates/pads the byte payload to a
    deterministic function of (w, h) so the pipeline shape — binary in,
    binary out, metadata rewrite — is exercised. Real impl swaps the
    lambda body for an actual resample."""
    target = max(1, (width * height) // 100)
    return df.withColumn(
        payload_col, F.substring(F.col(payload_col), 1, target)
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake-resized").alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("orig_size"),
        ),
    )


FRAME_SCHEMA = "doc_id long, frame_no long, n_bytes long, frame_md5 string"


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 1024,
    every: int = 4,
) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload: split
    the byte stream into fixed-size frames and keep every k-th.

    The codec is stubbed (frames are byte slices; a real deployment
    replaces the slicer with a demuxer/decoder emitting image tensors)
    but the distributed shape is the real one: mapInPandas fan-out of
    0..n output rows per input row, Arrow batches both ways, frame
    identity checksummed (md5) so the driver oracle can verify every
    sampled frame byte-for-byte. Self-contained closure — see
    decode_media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def frames(payload: bytes):
            n = len(payload)
            n_frames = (n + frame_size - 1) // frame_size
            for j in range(0, n_frames, every):
                chunk = payload[j * frame_size : (j + 1) * frame_size]
                yield j, len(chunk), hashlib.md5(chunk).hexdigest()

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for j, nb, digest in frames(bytes(payload)):
                    rows.append((int(did), j, nb, digest))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "n_bytes", "frame_md5"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)
