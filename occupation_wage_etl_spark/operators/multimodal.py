"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Design for 100 TB: media bytes live in a ``binary`` column (or object-store
URIs resolved at scan time); all per-asset work is Arrow-batched
``mapInPandas`` so each Python worker touches a whole record batch at a
time and the JVM⇄Python boundary is columnar.  The ops here are:

- ``sniff_metadata``   — REAL: container/codec detection + dimensions from
  magic bytes (PNG IHDR, JPEG SOF scan, GIF header, RIFF/WAV fmt chunk) in
  pure Python — no image libraries needed, fully deterministic.
- ``decode_image`` (``mode="real"``) — REAL stdlib decode for PNG
  (zlib inflate + scanline unfilter, 8-bit gray/RGB/±alpha) and BMP
  (24/32-bit uncompressed): grayscale raster + nearest-neighbor thumb.
  JPEG stays out of scope (entropy decode needs a codec lib) —
  ``mode="strict"`` raises for any undecodable payload, ``mode="fake"``
  keeps the md5-keystream fake for plumbing tests.
- ``decode_audio_stats`` — REAL WAV/PCM16 decode (stdlib ``struct``):
  per-asset sample stats without materializing waveforms into the plan.
- ``resize_image`` / ``sample_frames`` — resize has the same real path
  as decode; frame sampling from video containers is a PERMANENT STUB
  here (no ffmpeg): ``fake`` exercises the fan-out plumbing.
- ``extract_features`` — content-derived features, library-free.

Partitioning: media rows are wildly skewed by payload size, so every
operator optionally rebalances with ``repartition(n)`` BEFORE the Python
stage (one 4 GB video must not pin a core while 10 kB thumbnails queue).
At scale, prefer writing assets bucketed by size-band so AQE sees even
input splits.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
# pure-stdlib image/audio codecs (REAL, deterministic)
# ---------------------------------------------------------------------------


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (stdlib zlib; filter 0 rows).

    ``pixels`` is row-major ``width*height`` bytes.  Deterministic for a
    given input (fixed compression level), so synthesized fixtures are
    reproducible cluster-wide.
    """
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    idat = zlib.compress(raw, 6)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples/pixel


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filters (types 0-4) -> raw sample bytes."""
    stride = width * bpp
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        prev_row = out[(y - 1) * stride : y * stride] if y else bytes(stride)
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b_ = prev_row[i]
                c = prev_row[i - bpp] if i >= bpp else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
    return out


def decode_png_gray(b: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit PNG (gray/RGB/±alpha, non-interlaced) to a
    grayscale raster.  Returns (width, height, pixels); color collapses
    via integer luma (r*299 + g*587 + b*114) // 1000."""
    if not b.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, width, height, colortype, idat = 8, None, None, None, []
    while pos + 8 <= len(b):
        clen, ctype = struct.unpack(">I4s", b[pos : pos + 8])
        data = b[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            if colortype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG colortype {colortype}")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[colortype]
    samples = _png_unfilter(zlib.decompress(b"".join(idat)), width, height, ch)
    if ch == 1:
        return width, height, bytes(samples)
    gray = bytearray(width * height)
    for i in range(width * height):
        o = i * ch
        if ch == 2:  # gray + alpha
            gray[i] = samples[o]
        else:  # RGB / RGBA
            gray[i] = (
                samples[o] * 299 + samples[o + 1] * 587 + samples[o + 2] * 114
            ) // 1000
    return width, height, bytes(gray)


def decode_bmp_gray(b: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed 24/32-bit BMP to a grayscale raster."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", b[10:14])[0]
    width, height_raw = struct.unpack("<ii", b[18:26])
    bits, compression = struct.unpack("<HI", b[28:34])
    if compression != 0 or bits not in (24, 32):
        raise ValueError("only uncompressed 24/32-bit BMP supported")
    height, flipped = abs(height_raw), height_raw > 0
    bpp = bits // 8
    stride = (width * bpp + 3) & ~3  # rows pad to 4 bytes
    gray = bytearray(width * height)
    for y in range(height):
        src_y = height - 1 - y if flipped else y  # BMP stores bottom-up
        row = data_off + src_y * stride
        for x in range(width):
            o = row + x * bpp
            bl, g, r = b[o], b[o + 1], b[o + 2]
            gray[y * width + x] = (r * 299 + g * 587 + bl * 114) // 1000
    return width, height, bytes(gray)


def _nearest_resample(
    pixels: bytes, width: int, height: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor grayscale resample (floor index map — the
    deterministic cross-engine-replayable choice)."""
    out = bytearray(tw * th)
    for y in range(th):
        sy = y * height // th
        row = sy * width
        for x in range(tw):
            out[y * tw + x] = pixels[row + x * width // tw]
    return bytes(out)


def decode_image_bytes(b: bytes) -> tuple[int, int, bytes]:
    """Dispatch on magic: PNG or BMP → (width, height, gray pixels)."""
    if b.startswith(PNG_MAGIC):
        return decode_png_gray(b)
    if b[:2] == b"BM":
        return decode_bmp_gray(b)
    raise ValueError("undecodable image format (only PNG/BMP supported)")


# ---------------------------------------------------------------------------
# decode / resize / frame-sample / feature-extract operators
# ---------------------------------------------------------------------------

_STUB_MSG = (
    "payload is not decodable with the built-in stdlib codecs (PNG/BMP "
    "images, WAV/PCM16 audio); JPEG/video decode requires Pillow/ffmpeg — "
    "pass mode='fake' for the deterministic test fake, or swap the "
    "per-batch body for a codec-library decoder"
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
    mode: str = "real",
    thumb: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """(id, width, height, pixels array<int>) — decode to a ``thumb``²
    grayscale raster (width/height report the SOURCE dimensions).

    ``mode='real'``: stdlib PNG/BMP decode + nearest-neighbor resample;
    undecodable payloads (JPEG, video, garbage) raise — curate/filter by
    ``sniff_metadata`` mime first.  ``mode='fake'``: md5-keystream pixels
    for plumbing tests.  ``mode='strict'`` is a legacy alias that always
    raises (kept so callers can assert the no-codec-library posture)."""
    if mode not in ("real", "strict", "fake"):
        raise ValueError("mode must be 'real', 'strict' or 'fake'")
    out_schema = f"{id_col} long, width int, height int, pixels array<int>"
    n_px = thumb * thumb

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(_STUB_MSG)
            if mode == "fake":
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "width": thumb,
                        "height": thumb,
                        "pixels": [_fake_pixels(b, n_px) for b in pdf[bin_col]],
                    }
                )
                continue
            widths, heights, pixels = [], [], []
            for b in pdf[bin_col]:
                w, h, gray = decode_image_bytes(bytes(b or b""))
                widths.append(w)
                heights.append(h)
                px = (
                    gray
                    if (w, h) == (thumb, thumb)
                    else _nearest_resample(gray, w, h, thumb, thumb)
                )
                pixels.append(list(px))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": widths,
                    "height": heights,
                    "pixels": pixels,
                }
            )

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_decode, schema=out_schema)
    )


def decode_audio_stats(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    partitions: int | None = None,
) -> DataFrame:
    """(id, sample_rate, n_samples, peak, mean_abs) per WAV/PCM16 asset —
    REAL stdlib decode.  Emits stats, not waveforms: at 100 TB the
    decoded audio should never enter the shuffle unless a downstream op
    needs samples (then the same batch body yields array<short> chunks).
    Non-WAV payloads raise (curate by mime first)."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_samples long, "
        "peak int, mean_abs double"
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, counts, peaks, means = [], [], [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(b or b"")
                if not (
                    b.startswith(RIFF_MAGIC) and len(b) >= 12 and b[8:12] == b"WAVE"
                ):
                    raise ValueError(_STUB_MSG)
                i, rate, bits, data = 12, None, None, None
                while i + 8 <= len(b):
                    cid, csize = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
                    if cid == b"fmt " and i + 24 <= len(b):
                        rate = struct.unpack("<I", b[i + 12 : i + 16])[0]
                        bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
                    elif cid == b"data":
                        data = b[i + 8 : i + 8 + csize]
                    i += 8 + csize + (csize & 1)
                if rate is None or data is None or bits != 16:
                    raise ValueError(_STUB_MSG)
                n = len(data) // 2
                samples = struct.unpack(f"<{n}h", data[: n * 2])
                ids.append(rid)
                rates.append(rate)
                counts.append(n)
                peaks.append(max((abs(s) for s in samples), default=0))
                means.append(
                    sum(abs(s) for s in samples) / n if n else 0.0
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "sample_rate": rates,
                    "n_samples": counts,
                    "peak": peaks,
                    "mean_abs": means,
                }
            )

    return (
        _maybe_rebalance(df.select(id_col, bin_col), partitions)
        .mapInPandas(_stats, schema=out_schema)
    )


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    bin_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "real",
    partitions: int | None = None,
) -> DataFrame:
    """(id, width, height, content binary) — resized grayscale payload,
    re-encoded as PNG.  ``mode='real'``: stdlib PNG/BMP decode →
    nearest-neighbor resample → ``encode_png_gray``; 'fake' emits an
    md5-keystream payload of target_w*target_h bytes; 'strict' raises."""
    if mode not in ("real", "strict", "fake"):
        raise ValueError("mode must be 'real', 'strict' or 'fake'")
    out_schema = f"{id_col} long, width int, height int, content binary"
    n = target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(_STUB_MSG)
            if mode == "fake":
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "width": target_w,
                        "height": target_h,
                        "content": [bytes(_fake_pixels(b, n)) for b in pdf[bin_col]],
                    }
                )
                continue
            out = []
            for b in pdf[bin_col]:
                w, h, gray = decode_image_bytes(bytes(b or b""))
                resized = _nearest_resample(gray, w, h, target_w, target_h)
                out.append(encode_png_gray(target_w, target_h, resized))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": target_w,
                    "height": target_h,
                    "content": out,
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
    for frame extraction.  PERMANENT STUB for the decode step: video
    containers require ffmpeg-class demuxing that stdlib cannot provide
    (COVERAGE.md records the decision); 'fake' emits md5-derived 16-byte
    frame payloads at indexes 0, n, 2n, … so the fan-out plumbing stays
    tested."""
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
