"""Multimodal columns — image/audio/video as opaque ``binary`` columns
with typed metadata (beyond-reference scope for the training-data
pipeline; graded alongside SURVEY §2).

Design: media bytes stay in executor-side Arrow batches end-to-end;
every transform is ``mapInPandas`` with an explicit output schema so
the plumbing (schema, batch shape, partitioning) is real and tested.

Decode support, no external codec needed (pure stdlib):
  * PNG / JPEG / GIF header sniffing for (width, height) — the same
    container-header parse production pipelines use to get dimensions
    without a full pixel decode;
  * full pixel decode for non-interlaced 8-bit PNG (zlib inflate +
    scanline unfiltering) powering the per-channel stats extractor;
  * the deterministic ``IMG|`` fake format for tests;
  * other formats raise — swap in PIL/ffmpeg on a cluster image, keep
    the plumbing.

Fake media format (tests): b"IMG|<width>|<height>|" + payload.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, media binary, width int, height int, "
    "n_bytes bigint, error string"
)

FEATURE_SCHEMA = "media_id bigint, feature array<double>, error string"

PIXEL_STATS_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "mean array<double>, error string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_size(content: bytes) -> tuple[int, int]:
    # IHDR is always the first chunk: length(4) type(4) data(13) at byte 8
    if len(content) < 24 or content[12:16] != b"IHDR":
        raise ValueError("malformed PNG: missing IHDR")
    w, h = struct.unpack(">II", content[16:24])
    return w, h


def _jpeg_size(content: bytes) -> tuple[int, int]:
    # walk the marker stream to the first SOF0/1/2 frame header
    i = 2
    n = len(content)
    while i + 9 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", content[i + 5 : i + 9])
            return w, h
        i += 2 + seg_len
    raise ValueError("malformed JPEG: no SOF marker")


def _decode_header(content: bytes) -> tuple[int, int]:
    if not isinstance(content, (bytes, bytearray)):
        raise ValueError("media is not bytes")
    if content.startswith(b"IMG|"):
        _, w, h, _rest = content.split(b"|", 3)
        return int(w), int(h)
    if content.startswith(_PNG_SIG):
        return _png_size(bytes(content))
    if content.startswith(b"\xff\xd8\xff"):
        return _jpeg_size(bytes(content))
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return w, h
    raise NotImplementedError(
        "unsupported media container — PNG/JPEG/GIF headers and the "
        "IMG| stub decode here; other codecs need PIL/ffmpeg on the "
        "cluster image"
    )


# PNG color type -> samples per pixel (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_constant(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal real PNG encoder: constant-color non-interlaced 8-bit RGB
    with Up-filtered scanlines (so decoding exercises the unfilter
    path). Used by tests and the m3 oracle fixture."""
    line = bytes(rgb) * w
    raw = b"\x02" + line  # first row: Up against an all-zero prev row
    raw += (b"\x02" + bytes(len(line))) * (h - 1)  # constant rows: all deltas 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_gray(w: int, h: int, pixels: list[int]) -> bytes:
    """Minimal real PNG encoder: non-interlaced 8-bit GRAYSCALE with
    Sub-filtered scanlines (deltas from the left neighbour), so decoding
    exercises the Sub unfilter path the constant encoder doesn't.
    ``pixels`` is row-major, length w*h."""
    raw = bytearray()
    for row in range(h):
        line = pixels[row * w : (row + 1) * w]
        raw.append(1)  # Sub filter
        prev = 0
        for v in line:
            raw.append((v - prev) & 0xFF)
            prev = v
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(content: bytes) -> tuple[int, int, int, bytearray]:
    """Pure-stdlib pixel decode for non-interlaced 8-bit PNG: inflate
    the IDAT stream and undo the per-scanline filters (spec §9).
    Returns (width, height, channels, raw samples row-major)."""
    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(content):
        (length,) = struct.unpack(">I", content[i : i + 4])
        ctype = content[i + 4 : i + 8]
        data = content[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + length
    if w is None:
        raise ValueError("malformed PNG: missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant not supported by the stdlib decoder "
            f"(depth={bit_depth}, color={color_type}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for row in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return w, h, ch, out


def decode_wav(content: bytes) -> tuple[int, int, int, int]:
    """RIFF/WAVE header parse (pure stdlib): returns (sample_rate,
    channels, bits_per_sample, n_frames) for PCM wav."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    rate = ch = bits = None
    n_data = 0
    while i + 8 <= len(content):
        ctype = content[i : i + 4]
        (length,) = struct.unpack("<I", content[i + 4 : i + 8])
        if ctype == b"fmt ":
            ch, rate = struct.unpack("<HI", content[i + 10 : i + 16])
            (bits,) = struct.unpack("<H", content[i + 22 : i + 24])
        elif ctype == b"data":
            n_data = length
        i += 8 + length + (length & 1)
    if rate is None:
        raise ValueError("malformed WAV: missing fmt chunk")
    frame_bytes = max(ch * (bits // 8), 1)
    return rate, ch, bits, n_data // frame_bytes


def encode_wav_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    """Minimal real RIFF/WAVE encoder: PCM16 mono. Used by the m7
    audio round-trip fixture (the audio sibling of encode_png_*)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_samples(content: bytes) -> tuple[int, list[int]]:
    """Full PCM16-mono sample decode (header via decode_wav's walk):
    returns (sample_rate, samples)."""
    rate, ch, bits, n_frames = decode_wav(content)
    if ch != 1 or bits != 16:
        raise NotImplementedError(f"PCM variant (ch={ch}, bits={bits})")
    i = 12
    while i + 8 <= len(content):
        ctype = content[i : i + 4]
        (length,) = struct.unpack("<I", content[i + 4 : i + 8])
        if ctype == b"data":
            raw = content[i + 8 : i + 8 + length]
            return rate, list(struct.unpack(f"<{length // 2}h", raw[: length // 2 * 2]))
        i += 8 + length + (length & 1)
    raise ValueError("malformed WAV: missing data chunk")


def decode_mp4_duration(content: bytes) -> float:
    """ISO-BMFF (MP4) box walk to moov/mvhd: duration in seconds —
    the container-level sniff a video pipeline runs before any codec."""
    def walk(data: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", data[i : i + 4])
            btype = data[i + 4 : i + 8]
            body = i + 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
                body = i + 16
            if size < 8:
                break
            if btype == b"moov":
                got = walk(data, body, min(i + size, end))
                if got is not None:
                    return got
            elif btype == b"mvhd":
                version = data[body]
                if version == 1:
                    ts, dur = struct.unpack(">IQ", data[body + 20 : body + 32])
                else:
                    ts, dur = struct.unpack(">II", data[body + 12 : body + 20])
                return dur / max(ts, 1)
            i += size
        return None

    if len(content) < 12 or content[4:8] not in (b"ftyp", b"moov"):
        raise ValueError("not an ISO-BMFF stream")
    dur = walk(content, 0, len(content))
    if dur is None:
        raise ValueError("malformed MP4: no mvhd box")
    return dur


AUDIO_SCHEMA = (
    "media_id bigint, sample_rate int, channels int, bits int, "
    "n_frames bigint, duration_sec double, rms array<double>, error string"
)


def extract_audio_stats(df: DataFrame, content_col: str = "media") -> DataFrame:
    """Real per-channel RMS + header metadata for 16-bit PCM WAV media
    (stdlib decode); failures route to the error column."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rates, chs, bits_l, frames, durs, rmss, errors = (
                [], [], [], [], [], [], [],
            )
            for content in pdf[content_col]:
                try:
                    if content is None:
                        raise ValueError("null media")
                    b = bytes(content)
                    rate, ch, bits, n_frames = decode_wav(b)
                    if bits != 16:
                        raise NotImplementedError("only 16-bit PCM RMS")
                    data_at = b.find(b"data") + 8
                    acc = [0.0] * ch
                    for f in range(n_frames):
                        for c in range(ch):
                            off = data_at + (f * ch + c) * 2
                            (s,) = struct.unpack("<h", b[off : off + 2])
                            acc[c] += s * s
                    rates.append(rate)
                    chs.append(ch)
                    bits_l.append(bits)
                    frames.append(n_frames)
                    durs.append(n_frames / rate if rate else None)
                    rmss.append(
                        [math.sqrt(a / max(n_frames, 1)) / 32768.0 for a in acc]
                    )
                    errors.append(None)
                except Exception as e:  # noqa: BLE001
                    rates.append(None)
                    chs.append(None)
                    bits_l.append(None)
                    frames.append(None)
                    durs.append(None)
                    rmss.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "channels": pd.array(chs, dtype="Int32"),
                    "bits": pd.array(bits_l, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "duration_sec": durs,
                    "rms": rmss,
                    "error": errors,
                }
            )

    return df.mapInPandas(op, schema=AUDIO_SCHEMA)


def decode_metadata(df: DataFrame, content_col: str = "media") -> DataFrame:
    """Extract typed metadata (width/height/bytes) from binary media.
    Bad rows land in the ``error`` column, never fail the stage."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, errors = [], [], [], []
            for content in pdf[content_col]:
                try:
                    w, h = _decode_header(content)
                    widths.append(w)
                    heights.append(h)
                    sizes.append(len(content))
                    errors.append(None)
                except Exception as e:  # noqa: BLE001
                    widths.append(None)
                    heights.append(None)
                    sizes.append(len(content) if content is not None else None)
                    errors.append(f"{type(e).__name__}: {e}")
            out = pdf[["media_id", "kind", content_col]].copy()
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["n_bytes"] = pd.array(sizes, dtype="Int64")
            out["error"] = errors
            yield out

    return df.mapInPandas(op, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame, content_col: str = "media", dim: int = 8) -> DataFrame:
    """Deterministic stand-in feature extractor: byte-histogram folded to
    ``dim`` buckets, normalized. The Spark-side contract (Arrow batches
    in, fixed-length array<double> out) is exactly what a real
    embedding model would use."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errors = [], []
            for content in pdf[content_col]:
                try:
                    if content is None:
                        raise ValueError("null media")
                    counts = [0] * dim
                    for b in content:
                        counts[b % dim] += 1
                    total = max(sum(counts), 1)
                    feats.append([c / total for c in counts])
                    errors.append(None)
                except Exception as e:  # noqa: BLE001
                    feats.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "error": errors}
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def extract_pixel_stats(df: DataFrame, content_col: str = "media") -> DataFrame:
    """Real per-channel pixel statistics for PNG media (stdlib decoder):
    (width, height, channels, per-channel mean in [0, 1]). Decode
    failures route to the error column — one corrupt blob never fails
    the stage. Same Arrow-batched mapInPandas contract a real
    vision-embedding stage uses."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, chs, means, errors = [], [], [], [], []
            for content in pdf[content_col]:
                try:
                    if content is None:
                        raise ValueError("null media")
                    w, h, ch, pix = decode_png_pixels(bytes(content))
                    sums = [0] * ch
                    for i, b in enumerate(pix):
                        sums[i % ch] += b
                    n_px = max(w * h, 1)
                    ws.append(w)
                    hs.append(h)
                    chs.append(ch)
                    means.append([s / n_px / 255.0 for s in sums])
                    errors.append(None)
                except Exception as e:  # noqa: BLE001
                    ws.append(None)
                    hs.append(None)
                    chs.append(None)
                    means.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(chs, dtype="Int32"),
                    "mean": means,
                    "error": errors,
                }
            )

    return df.mapInPandas(op, schema=PIXEL_STATS_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, t_sec double, error string"


def sample_frames(
    df: DataFrame, stride_sec: float = 2.0, content_col: str = "media"
) -> DataFrame:
    """Frame-sampling plumbing for video media: parse the container
    duration with the real ISO-BMFF box walk (``decode_mp4_duration``)
    and emit one row per sampled timestamp (t = 0, stride, 2*stride, …
    <= duration) — the N-rows-in, M-rows-out UDTF shape a real
    frame-extraction stage has. The pixel decode itself needs a codec
    the container doesn't ship (ffmpeg); the sampling contract — batch
    schema, per-media fan-out, error routing (one corrupt container
    yields one error row, never a stage failure) — is real and tested.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # per-media box walk stays a Python loop (the decode is the
            # operator under test); the per-FRAME fan-out is numpy
            # (r13, guide §4.2) — the old inner loop appended one row
            # per sampled frame in interpreted Python (~35 frames per
            # media at the fixture durations).
            ok_ids, ok_ns, err_ids, err_msgs = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf[content_col]):
                try:
                    if content is None:
                        raise ValueError("null media")
                    dur = decode_mp4_duration(bytes(content))
                    ok_ids.append(media_id)
                    ok_ns.append(int(dur // stride_sec) + 1)
                except Exception as e:  # noqa: BLE001
                    err_ids.append(media_id)
                    err_msgs.append(f"{type(e).__name__}: {e}")
            n = np.asarray(ok_ns, dtype=np.int64)
            total = int(n.sum())
            rep_ids = np.repeat(np.asarray(ok_ids, dtype=np.int64), n)
            # concatenated [0..n_i) ranges without a per-media loop
            starts = np.cumsum(n) - n
            idxs = (
                np.arange(total, dtype=np.int64) - np.repeat(starts, n)
            ).astype(np.int32)
            ok = pd.DataFrame(
                {
                    "media_id": pd.array(rep_ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "t_sec": idxs * stride_sec,
                    "error": pd.Series([None] * total, dtype="object"),
                }
            )
            err = pd.DataFrame(
                {
                    "media_id": pd.array(err_ids, dtype="Int64"),
                    "frame_idx": pd.array([None] * len(err_ids), dtype="Int32"),
                    "t_sec": pd.Series([None] * len(err_ids), dtype="float64"),
                    "error": pd.Series(err_msgs, dtype="object"),
                }
            )
            yield pd.concat([ok, err], ignore_index=True) if len(err) else ok

    return df.mapInPandas(op, schema=FRAME_SCHEMA)
