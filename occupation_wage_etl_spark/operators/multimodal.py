"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Design for 100 TB: media bytes live in a ``binary`` column (or object-store
URIs resolved at scan time); all per-asset work is Arrow-batched
``mapInPandas`` so each Python worker touches a whole record batch at a
time and the JVM⇄Python boundary is columnar.  The ops here are:

- ``sniff_metadata``   — REAL: container/codec detection + dimensions from
  magic bytes (PNG IHDR, JPEG SOF scan, GIF header, RIFF/WAV fmt chunk) in
  pure Python — no image libraries needed, fully deterministic.
- ``decode_image`` / ``resize_image`` / ``sample_frames`` /
  ``extract_features`` — the decode step itself needs codec libraries that
  are NOT in this container, so it is STUBBED: ``mode="strict"`` raises
  ``NotImplementedError``; ``mode="fake"`` produces a clearly-marked
  deterministic fake (md5-seeded) so the Spark-side plumbing — schemas,
  batch iteration, partition balancing, downstream joins — is real and
  testable end-to-end.  Swapping in Pillow/ffmpeg later only changes the
  per-batch body, not a single plan.

Partitioning: media rows are wildly skewed by payload size, so every
operator optionally rebalances with ``repartition(n)`` BEFORE the Python
stage (one 4 GB video must not pin a core while 10 kB thumbnails queue).
At scale, prefer writing assets bucketed by size-band so AQE sees even
input splits.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# pure-Python magic-byte sniffing (REAL, deterministic, no codec libs)
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
GIF_MAGICS = (b"GIF87a", b"GIF89a")
RIFF_MAGIC = b"RIFF"

METADATA_SCHEMA = (
    "mime string, n_bytes long, width int, height int, "
    "sample_rate int, channels int, duration_ms long"
)


def sniff_bytes(b: bytes | None) -> dict:
    """Classify one payload and pull typed metadata out of its header.

    Returns dict with keys mime/n_bytes/width/height/sample_rate/channels/
    duration_ms (None where not applicable).  Malformed headers degrade to
    mime-only — never raises.
    """
    out = {
        "mime": "application/octet-stream",
        "n_bytes": 0 if b is None else len(b),
        "width": None,
        "height": None,
        "sample_rate": None,
        "channels": None,
        "duration_ms": None,
    }
    if not b:
        return out
    try:
        if b.startswith(PNG_MAGIC):
            out["mime"] = "image/png"
            # IHDR must be the first chunk: length@8, type@12, data@16
            if len(b) >= 24 and b[12:16] == b"IHDR":
                out["width"], out["height"] = struct.unpack(">II", b[16:24])
        elif b.startswith(JPEG_MAGIC):
            out["mime"] = "image/jpeg"
            # scan markers for a start-of-frame (SOF0/1/2) segment
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                marker, seglen = b[i + 1], struct.unpack(">H", b[i + 2 : i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2):
                    out["height"], out["width"] = struct.unpack(
                        ">HH", b[i + 5 : i + 9]
                    )
                    break
                i += 2 + seglen
        elif b.startswith(GIF_MAGICS):
            out["mime"] = "image/gif"
            if len(b) >= 10:
                out["width"], out["height"] = struct.unpack("<HH", b[6:10])
        elif b.startswith(RIFF_MAGIC) and len(b) >= 12 and b[8:12] == b"WAVE":
            out["mime"] = "audio/wav"
            # walk chunks: [id:4][size:4][data:size]
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(b):
                cid, csize = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    out["channels"] = struct.unpack("<H", b[i + 10 : i + 12])[0]
                    out["sample_rate"] = struct.unpack("<I", b[i + 12 : i + 16])[0]
                    byte_rate = struct.unpack("<I", b[i + 16 : i + 20])[0]
                elif cid == b"data":
                    data_size = csize
                i += 8 + csize + (csize & 1)
            if byte_rate and data_size is not None:
                out["duration_ms"] = int(data_size * 1000 // byte_rate)
    except (struct.error, IndexError):
        pass  # truncated header: keep whatever was parsed before the cut
    return out


def _maybe_rebalance(df: DataFrame, partitions: int | None) -> DataFrame:
    return df.repartition(partitions) if partitions else df


def sniff_metadata(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """(id, mime, n_bytes, width, height, sample_rate, channels,
    duration_ms) per asset — Arrow-batched mapInPandas over the binary
    column, header-only parsing (never decodes payloads)."""
    out_schema = f"{id_col} long, {METADATA_SCHEMA}"

    def _sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_bytes(b) for b in pdf[bin_col]]
            res = pd.DataFrame(metas)
            res.insert(0, id_col, pdf[id_col].to_numpy())
            yield res

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_sniff, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# decode / resize / frame-sample / feature-extract — STUBBED decode step
# ---------------------------------------------------------------------------

_STUB_MSG = (
    "media decoding requires codec libraries (Pillow/ffmpeg) that are not "
    "available in this environment; pass mode='fake' for the deterministic "
    "test fake, or swap the per-batch body for a real decoder"
)


def _fake_pixels(b: bytes, n: int) -> list[int]:
    """Deterministic fake 'decoded pixels': md5-keystream over the payload.
    Clearly NOT real decoding — exists so downstream plumbing is testable."""
    out: list[int] = []
    seed = b or b""
    counter = 0
    while len(out) < n:
        out.extend(hashlib.md5(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return out[:n]


def decode_image(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "strict",
    thumb: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """(id, width, height, pixels array<int>) — decode to a ``thumb``²
    grayscale raster.  STUB: decode itself is not implementable here (see
    module docstring); ``mode='fake'`` yields md5-keystream pixels."""
    if mode not in ("strict", "fake"):
        raise ValueError("mode must be 'strict' or 'fake'")
    out_schema = f"{id_col} long, width int, height int, pixels array<int>"
    n_px = thumb * thumb

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(_STUB_MSG)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": thumb,
                    "height": thumb,
                    "pixels": [_fake_pixels(b, n_px) for b in pdf[bin_col]],
                }
            )

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_decode, schema=out_schema)
    )


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    bin_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "strict",
    partitions: int | None = None,
) -> DataFrame:
    """(id, width, height, content binary) resized payload.  STUB decode;
    'fake' emits an md5-keystream payload of exactly target_w*target_h
    bytes (shape-correct plumbing)."""
    out_schema = f"{id_col} long, width int, height int, content binary"
    n = target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(_STUB_MSG)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": target_w,
                    "height": target_h,
                    "content": [bytes(_fake_pixels(b, n)) for b in pdf[bin_col]],
                }
            )

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_resize, schema=out_schema)
    )


def sample_frames(
    df: DataFrame,
    every_nth: int = 10,
    max_frames: int = 4,
    bin_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "strict",
    partitions: int | None = None,
) -> DataFrame:
    """One output row per sampled frame: (id, frame_idx, frame binary).
    A fan-out mapInPandas (rows out > rows in) — the Spark-native shape
    for frame extraction.  STUB decode; 'fake' emits md5-derived 16-byte
    frame payloads at indexes 0, n, 2n, …"""
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(_STUB_MSG)
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                for j in range(max_frames):
                    fi = j * every_nth
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(
                        hashlib.md5((b or b"") + fi.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_sample, schema=out_schema)
    )


def extract_features(
    df: DataFrame,
    dim: int = 8,
    bin_col: str = "content",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """(id, feature array<double>) — content-derived feature vector.

    REAL plumbing + deterministic md5-derived features (each slot is a
    [0,1) double from 4 digest bytes); a real encoder drops into the same
    batch body.  Unlike decode this has no library dependency, so no
    strict/fake split.

    Keystream block k = md5 of the ASCII string ``HEX(payload) + ":" + k``
    (not md5 of raw bytes: DuckDB's md5 only hashes VARCHAR, and the
    correctness oracle replays this as ``md5(hex(b) || ':k')`` — uppercase
    hex on both sides)."""
    out_schema = f"{id_col} long, feature array<double>"
    n_blocks = (dim * 4 + 15) // 16

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bin_col]:
                hx = (b or b"").hex().upper()
                raw = b"".join(
                    hashlib.md5(f"{hx}:{k}".encode()).digest()
                    for k in range(n_blocks)
                )
                feats.append(
                    [
                        int.from_bytes(raw[i * 4 : i * 4 + 4], "big")
                        / float(1 << 32)
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "feature": feats})

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_feat, schema=out_schema)
    )
