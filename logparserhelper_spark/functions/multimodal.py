"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested. Decode status per
modality (the accepted boundary for this image):

- audio/WAV: REAL decode (``wav_decode``) — PCM 8/16-bit via the stdlib
  ``wave`` module, plus G.711 mu-law / A-law companding and IMA-ADPCM
  blocks (the telephony/meeting-audio formats) parsed from the RIFF
  chunks directly; duration/channels/rate plus global and windowed RMS
  features.
- image/BMP: REAL decode via stdlib ``struct`` parsing (``bmp_decode``) —
  uncompressed 8-bit palettized / 24 / 32-bit DIBs, bottom-up or top-down,
  row padding handled; features are dimensions + per-channel means + band
  luminances.
- image/PNG: REAL decode via stdlib ``zlib`` (``png_decode``) — CRC-checked
  chunks, bounded inflate, full per-scanline unfilter
  (None/Sub/Up/Average/Paeth), gray / RGB / palette / gray-alpha / RGBA at
  depth 8 or 16, progressive (Adam7) or not. Same feature layout as
  BMP/PPM.
- image/PPM: REAL decode (binary P6 with comments and maxval scaling).
- image/GIF: REAL decode (``gif_decode``) — full LZW decompression with
  variable code width and table resets, global/local color tables,
  4-pass deinterlace; first frame.
- image/JPEG: REAL decode (``functions/jpeg.py`` via ``jpeg_decode``) —
  baseline AND progressive DCT: Huffman entropy decode (incl. spectral
  selection + successive approximation + EOB runs), dequant, 8x8 IDCT,
  4:4:4/4:2:2/4:2:0 chroma upsample, restart intervals, BT.601
  YCbCr->RGB. Arithmetic/lossless fall back to the fake path.
- image/TIFF: REAL decode (``tiff_decode``) — either byte order, strips,
  uncompressed / deflate / PackBits, gray (both polarities) / RGB / RGBA /
  palette at 8 bits per sample.
- image/WebP: REAL decode for LOSSLESS payloads (``functions/webp.py``) —
  the full VP8L bitstream: simple + code-length-coded prefix codes, LZ77
  with the 120-entry distance map, color cache, meta-prefix tiles, and
  all four transforms (predictor/color/subtract-green/color-indexing
  with sub-byte bundling). Lossy ``VP8 `` chunks fall back to the fake
  path (a full VP8 intra decoder is out of scope).
- remaining gaps (video beyond MJPEG-AVI, non-WAV audio): STUBBED — the sandbox ships no codec
  libraries (no PIL/cv2/imageio/librosa/av); ``fake_decode`` derives
  deterministic pseudo-features from the md5 of the payload so the
  plumbing is testable end-to-end (and oracle-checkable: the driver
  contract query ``media_features`` reproduces them in DuckDB). Swap in a
  real decoder by passing ``decode_fn`` in production.

The default ``auto_decode`` dispatches on container magic bytes:
RIFF/WAVE, BM, P6, PNG, GIF8xa, JPEG SOI, and TIFF II*/MM* payloads take
the real paths, everything else the deterministic fake.

At 100 TB: binary payloads dominate row size, so media tables must set
``spark.sql.files.maxPartitionBytes`` low enough that one Arrow batch of
rows (payload bytes x maxRecordsPerBatch) fits executor memory; the helper
``media_read_conf`` returns the suggested conf for a target batch budget.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16

# Decoders allocate from untrusted header fields; cap the pixel count so a
# crafted payload (decompression bomb, bogus GIF/PNG dimensions) raises a
# clean ValueError -> fake_decode fallback instead of OOMing the executor.
# 2^26 pixels = an 8192x8192 image (~1.5 GB as float64 RGB, the peak any
# one decode may allocate).
MAX_DECODE_PIXELS = 1 << 26


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats derived
    from the md5 of the payload. Replace with a real decode+embed in prod."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


# IMA-ADPCM tables (IMA ADPCM reference algorithm / WAV format 0x11).
# Plain tuples, not numpy arrays: the decode loop indexes them one scalar at
# a time, where tuple __getitem__ is several times faster than a numpy
# scalar lookup.
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8) * 2
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ulaw_to_lin(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> int16 (the audioop.ulaw2lin mapping)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 0x07
    m = u & 0x0F
    mag = (((m << 3) + 0x84) << e) - 0x84
    return np.where(sign, -mag, mag)


def _alaw_to_lin(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> int16 (the audioop.alaw2lin mapping)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = a & 0x80
    e = (a >> 4) & 0x07
    m = a & 0x0F
    mag = np.where(e == 0, (m << 4) + 8, ((m << 4) + 0x108) << (e - 1))
    return np.where(sign, mag, -mag)  # A-law: bit 7 SET means positive


def _ima_adpcm_decode_block(data: bytes, n_ch: int) -> np.ndarray:
    """Decode one IMA-ADPCM WAV block: per channel a 4-byte state header
    (predictor int16, step index, reserved), then nibble groups of 4 bytes
    (8 samples) interleaved channel-major. Returns (n_samples, n_ch) int."""
    import struct

    preds = []
    idxs = []
    for c in range(n_ch):
        p, i, _r = struct.unpack_from("<hBB", data, c * 4)
        preds.append(int(p))
        idxs.append(min(88, max(0, int(i))))
    body = data[4 * n_ch :]
    group = 4 * n_ch  # bytes per 8-sample-per-channel round
    out = [[p] for p in preds]  # header predictor IS the first sample
    for g0 in range(0, len(body) - group + 1, group):
        for c in range(n_ch):
            chunk = body[g0 + 4 * c : g0 + 4 * c + 4]
            pred, idx = preds[c], idxs[c]
            for byte in chunk:
                for nib in (byte & 0x0F, byte >> 4):
                    step = _IMA_STEP_TABLE[idx]
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    if nib & 8:
                        pred -= diff
                    else:
                        pred += diff
                    pred = min(32767, max(-32768, pred))
                    idx = min(88, max(0, idx + _IMA_INDEX_TABLE[nib]))
                    out[c].append(pred)
            preds[c], idxs[c] = pred, idx
    n = min(len(o) for o in out)
    return np.array([o[:n] for o in out], dtype=np.int64).T


def wav_decode_samples(payload: bytes) -> tuple:
    """REAL audio decode for RIFF/WAVE payloads, at sample level:
    (sample_rate, n_channels, n_frames, x) with x the flat float64
    sample stream in [-1, 1) (interleaved when n_channels > 1). Formats:
    PCM 8/16-bit (stdlib ``wave``), G.711 mu-law (7) and A-law (6)
    companding, and IMA ADPCM (0x11) blocks — the formats
    telephony/meeting-transcript corpora actually carry. Anything else
    raises (callers fall back). ``wav_decode`` summarizes this into the
    FEATURE_DIM layout; ``audio_tone_features`` consumes it spectrally."""
    import io
    import struct
    import wave as _wave

    # peek the fmt chunk: stdlib wave only reads PCM
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    fmt_tag = None
    ch = sr = bits = block_align = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt_tag, ch, sr, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt_tag is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if ch < 1 or sr <= 0:
        raise ValueError("bad WAV fmt")
    if fmt_tag == 1:  # PCM: keep the battle-tested stdlib path
        with _wave.open(io.BytesIO(payload), "rb") as w:
            n = w.getnframes()
            ch = w.getnchannels()
            sr = w.getframerate()
            sw = w.getsampwidth()
            raw = w.readframes(n)
        if sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 1:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported sample width {sw}")
        n_frames = n
    elif fmt_tag in (6, 7):  # G.711 A-law / mu-law
        codes = np.frombuffer(data, dtype=np.uint8)
        n_frames = len(codes) // ch
        # truncate a ragged tail (data bytes not divisible by n_channels)
        # so the contract x.size == n_frames * ch holds for every format
        codes = codes[: n_frames * ch]
        lin = _alaw_to_lin(codes) if fmt_tag == 6 else _ulaw_to_lin(codes)
        x = lin.astype(np.float64) / 32768.0
    elif fmt_tag == 0x11:  # IMA ADPCM
        if not block_align or block_align < 4 * ch:
            raise ValueError("bad ADPCM block align")
        frames = []
        for b0 in range(0, len(data) - 4 * ch + 1, block_align):
            frames.append(_ima_adpcm_decode_block(data[b0 : b0 + block_align], ch))
        if not frames:
            raise ValueError("empty ADPCM stream")
        samples = np.concatenate(frames, axis=0)  # (n, ch)
        n_frames = samples.shape[0]
        x = (samples.reshape(-1).astype(np.float64)) / 32768.0
    else:
        raise ValueError(f"unsupported WAV format tag {fmt_tag}")
    return sr, ch, n_frames, x


def wav_decode(payload: bytes) -> np.ndarray:
    """FEATURE_DIM floats over ``wav_decode_samples``: [duration_s,
    n_channels, sample_rate/1e5, global RMS] + 12 windowed RMS values."""
    sr, ch, n_frames, x = wav_decode_samples(payload)
    dur = n_frames / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    win_rms = [
        float(np.sqrt(np.mean(c * c))) if c.size else 0.0
        for c in np.array_split(x, FEATURE_DIM - 4)
    ]
    return np.array([dur, float(ch), sr / 1e5, rms] + win_rms, dtype=np.float32)


def audio_tone_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Spectral audio analysis over the real WAV decoders: per row,
    (media_id, sr, n_samples, dom_bin, dom_freq) where dom_bin is the
    rFFT magnitude argmax over bins 1..N/2 (DC excluded — it only carries
    offset) of the channel-averaged signal and dom_freq = dom_bin*sr/N.
    mapInPandas (per-blob Python is inherent for stdlib codecs); payloads
    that are not decodable WAV yield no rows."""
    out_schema = "media_id long, sr int, n_samples int, dom_bin int, dom_freq double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sr", "n_samples", "dom_bin", "dom_freq")}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                try:
                    sr, ch, n_frames, x = wav_decode_samples(bytes(p))
                    if n_frames < 2:
                        continue
                    # inside the try: a malformed stream must skip this
                    # row, never abort the stage
                    mono = x.reshape(n_frames, ch).mean(axis=1) if ch > 1 else x
                    mag = np.abs(np.fft.rfft(mono))
                    k = int(np.argmax(mag[1:])) + 1  # skip DC
                except Exception:
                    continue
                rows["media_id"].append(mid)
                rows["sr"].append(sr)
                rows["n_samples"].append(n_frames)
                rows["dom_bin"].append(k)
                rows["dom_freq"].append(k * sr / len(mono))
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=out_schema)


def _bgr_features(w: int, h: int, bpp: float, bgr: np.ndarray) -> np.ndarray:
    """Shared feature layout for all real image decoders: FEATURE_DIM floats =
    [width, height, bits-per-pixel, mean_B, mean_G, mean_R] + 10 horizontal
    band mean luminances ((B+G+R)/3/255, top band first). ``bgr`` is an
    (h, w, 3) float64 array of 0..255 channel values in B,G,R order."""
    means = bgr.reshape(-1, 3).mean(axis=0) / 255.0
    lum = bgr.mean(axis=(1, 2)) / 255.0  # per-row luminance
    bands = [
        float(np.mean(c)) if c.size else 0.0
        for c in np.array_split(lum, FEATURE_DIM - 6)
    ]
    return np.array(
        [float(w), float(h), float(bpp), means[0], means[1], means[2]] + bands,
        dtype=np.float32,
    )


def bmp_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for BMP payloads (pure stdlib ``struct``):
    uncompressed (BI_RGB) 8-bit palettized (indices mapped through the
    BGRX color table that sits between the DIB header and the pixel
    array; a paletteless 8-bit DIB is treated as grayscale), 24-bit BGR,
    or 32-bit BGRA DIBs; bottom-up (positive height) or top-down
    (negative), 4-byte row padding. Feature layout: ``_bgr_features``.
    Anything the parser doesn't support raises (callers fall back to
    fake_decode)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32) or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h_abs = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, offset=data_off,
                       count=stride * h_abs)
    rows = px.reshape(h_abs, stride)[:, : w * nch]
    if not top_down:
        rows = rows[::-1]  # bottom-up storage -> top-first
    img = rows.reshape(h_abs, w, nch).astype(np.float64)
    if nch == 1:
        # 8-bpp is palettized: the BGRX color table sits between the DIB
        # header and the pixel array. biClrUsed (offset 46) bounds it; 0
        # means the full 2^8 entries. A file with no palette bytes at all
        # (data_off == end of headers) is treated as raw grayscale.
        pal_start = 14 + hdr_size
        pal_bytes = max(0, data_off - pal_start)
        n_entries = struct.unpack_from("<I", payload, 46)[0] or 256
        n_entries = min(n_entries, pal_bytes // 4, 256)
        if n_entries > 0:
            pal = np.frombuffer(
                payload, dtype=np.uint8, offset=pal_start, count=n_entries * 4
            ).reshape(n_entries, 4)[:, :3]  # B, G, R
            lut = np.zeros((256, 3), dtype=np.uint8)
            lut[:n_entries] = pal
            bgr = lut[rows.reshape(h_abs, w)].astype(np.float64)
        else:
            bgr = np.repeat(img, 3, axis=2)
    else:
        bgr = img[:, :, :3]  # drop alpha for 32-bit
    return w, h_abs, float(bpp), bgr


def ppm_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for binary PPM (P6) payloads: ASCII header
    (magic, width, height, maxval; '#' comments allowed) then raw RGB
    triplets. Same feature layout as bmp_decode —
    [width, height, bits-per-pixel(=24), mean_B, mean_G, mean_R] + 10 band
    luminances — so downstream consumers are container-agnostic."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # tokenize header: magic, width, height, maxval (comments to EOL)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM (w={w}, h={h}, maxval={maxval})")
    px = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=w * h * 3)
    img = px.reshape(h, w, 3).astype(np.float64) * (255.0 / maxval)
    return w, h, 24.0, img[:, :, ::-1]  # PPM stores RGB; flip to BGR


def make_bmp(width: int, height: int, pixels_rgb) -> bytes:
    """Serialize a 24-bit bottom-up BMP from ``pixels_rgb`` — an iterable of
    rows (top-first) of (r, g, b) tuples. Deterministic; used by tests and
    the contract-query fixture (and doubles as the write path a real media
    sink would use)."""
    import struct

    rows = [list(r) for r in pixels_rgb]
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in row) + pad
        for row in reversed(rows)  # bottom-up
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + body


# Adam7 pass lattice: (x_start, y_start, x_step, y_step), pass 1..7
# (PNG spec §8.2; every pixel covered exactly once across the 7 passes)
ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_row_stride(npix: int, channels: int, depth: int) -> int:
    """Bytes per PNG scanline (excluding the filter byte): samples are
    packed, so sub-byte depths round up to whole bytes. The ONE source of
    truth shared by png_decode and make_png — encoder and decoder must
    agree on stride."""
    return -(-(npix * channels * depth) // 8)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (spec §6: None/Sub/Up/Average/
    Paeth). ``raw`` is the inflated IDAT stream: h rows of (1 filter byte +
    stride data bytes). Up is vectorized with numpy; Sub/Average/Paeth carry
    an intra-row dependency so they scan bytes (fine for feature extraction;
    a production decoder would use a codec library)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        cur = np.frombuffer(raw, dtype=np.uint8, offset=pos, count=stride).astype(np.int32)
        pos += stride
        if ft == 0:
            line = cur
        elif ft == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ft in (1, 3, 4):
            line = cur  # in-place reconstruction below
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                if ft == 1:  # Sub
                    pr = a
                elif ft == 3:  # Average
                    pr = (a + prev[i]) >> 1
                else:  # Paeth
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = line
        prev = line
    return out.tobytes()


def png_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for PNG payloads (pure stdlib ``zlib`` +
    ``struct``): every spec-legal depth/color-type combination — gray at
    1/2/4/8/16 bits, palette at 1/2/4/8, RGB / gray+alpha / RGBA at 8/16 —
    non-interlaced OR Adam7 (7 independently-filtered sub-images placed on
    their lattices). Chunk CRCs are verified; multiple IDAT chunks are
    concatenated before one size-bounded inflate. Alpha is dropped, 16-bit
    samples scale to 0..255 (x/257), sub-byte gray scales to full range,
    palette indices map through PLTE. Feature layout: ``_bgr_features``
    (identical to bmp_decode/ppm_decode so downstream consumers stay
    container-agnostic)."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data_start = pos + 8
        data_end = data_start + length
        if data_end + 4 > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[data_start:data_end]
        crc = struct.unpack_from(">I", payload, data_end)[0]
        if zlib.crc32(payload[pos + 4 : data_end]) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos = data_end + 4
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (compression={comp}, filter={filt}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    valid_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color_type, (8, 16))
    if channels is None or depth not in valid_depths:
        raise ValueError(f"unsupported PNG (color_type={color_type}, depth={depth})")
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError("bad PNG dimensions")

    def row_stride(npix: int) -> int:
        return _png_row_stride(npix, channels, depth)

    def subimage(raw_seg: bytes, ph: int, pw: int) -> np.ndarray:
        """Unfilter one (sub-)image and return raw sample values
        (ph, pw, channels) as float64 — sub-byte depths unpack MSB-first
        with end-of-scanline filler bits dropped."""
        stride = row_stride(pw)
        bpp = max(1, channels * depth // 8)
        flat = _png_unfilter(raw_seg, ph, stride, bpp)
        if depth == 16:
            return np.frombuffer(flat, dtype=">u2").astype(np.float64).reshape(
                ph, pw, channels
            )
        if depth == 8:
            return np.frombuffer(flat, dtype=np.uint8).astype(np.float64).reshape(
                ph, pw, channels
            )
        bits = np.unpackbits(
            np.frombuffer(flat, dtype=np.uint8).reshape(ph, stride), axis=1
        )
        groups = bits[:, : pw * depth].reshape(ph, pw, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.float64)
        return (groups * weights).sum(axis=2)[..., None]

    # bounded inflate: cap output at the expected pixel-data size so a
    # decompression bomb cannot expand past the header's own claim
    if interlace:
        passes = [
            (x0, y0, dx, dy)
            for x0, y0, dx, dy in ADAM7_PASSES
            if -(-(w - x0) // dx) > 0 and -(-(h - y0) // dy) > 0
        ]
        expected = sum(
            (-(-(h - y0) // dy)) * (1 + row_stride(-(-(w - x0) // dx)))
            for x0, y0, dx, dy in passes
        )
    else:
        expected = h * (row_stride(w) + 1)
    raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG pixel data length mismatch")
    if interlace:
        # Adam7: 7 independently-filtered sub-images, each placed on its
        # (x0::dx, y0::dy) lattice of the output frame
        img = np.zeros((h, w, channels), dtype=np.float64)
        off = 0
        for x0, y0, dx, dy in passes:
            pw = -(-(w - x0) // dx)
            ph = -(-(h - y0) // dy)
            seg = ph * (row_stride(pw) + 1)
            img[y0::dy, x0::dx] = subimage(raw[off : off + seg], ph, pw)
            off += seg
    else:
        img = subimage(raw, h, w)
    if depth == 16:
        img /= 257.0
    elif depth < 8 and color_type == 0:
        img *= 255.0 / ((1 << depth) - 1)  # gray sub-byte -> full range
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/bad PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)  # R, G, B
        lut = np.zeros((256, 3), dtype=np.uint8)
        lut[: pal.shape[0]] = pal
        rgb = lut[img[:, :, 0].astype(np.intp)].astype(np.float64)
    elif color_type in (0, 4):
        rgb = np.repeat(img[:, :, :1], 3, axis=2)  # gray (alpha dropped)
    else:  # 2, 6
        rgb = img[:, :, :3]
    bgr = rgb[:, :, ::-1]
    return w, h, float(depth * channels), bgr


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): n in 0..127 -> copy n+1
    literals; n in -127..-1 -> repeat next byte 1-n times; -128 is a noop."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes((data[i],)) * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:expected])


def tiff_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for TIFF payloads (pure stdlib ``struct`` +
    ``zlib``): either byte order, first IFD, strip-based layout,
    compression 1 (none), 8/32946 (zlib deflate), or 32773 (PackBits);
    photometric 0/1 (gray, MinIsWhite inverted), 2 (RGB, extra samples
    dropped), 3 (palette via the 16-bit ColorMap); 8 bits per sample.
    Tiled/JPEG-in-TIFF/16-bit raise (callers fall back to fake_decode).
    Feature layout: ``_bgr_features``."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    fmt = "<" if payload[:2] == b"II" else ">"
    if struct.unpack(fmt + "H", payload[2:4])[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd = struct.unpack(fmt + "I", payload[4:8])[0]
    n = struct.unpack_from(fmt + "H", payload, ifd)[0]
    TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

    def tag_values(entry_off):
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", payload, entry_off)
        size = TYPE_SIZE.get(typ, 1) * cnt
        voff = entry_off + 8 if size <= 4 else struct.unpack_from(fmt + "I", payload, entry_off + 8)[0]
        if typ == 3:
            vals = struct.unpack_from(f"{fmt}{cnt}H", payload, voff)
        elif typ == 4:
            vals = struct.unpack_from(f"{fmt}{cnt}I", payload, voff)
        elif typ in (1, 2):
            vals = tuple(payload[voff : voff + cnt])
        else:
            vals = (struct.unpack_from(fmt + "I", payload, entry_off + 8)[0],)
        return tag, vals

    tags = {}
    for i in range(n):
        tag, vals = tag_values(ifd + 2 + 12 * i)
        tags[tag] = vals
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported")
    if tags.get(284, (1,))[0] != 1:
        raise ValueError("planar-configuration TIFF unsupported")
    predictor = tags.get(317, (1,))[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    w = tags.get(256, (0,))[0]
    h = tags.get(257, (0,))[0]
    comp = tags.get(259, (1,))[0]
    photo = tags.get(262, (1,))[0]
    spp = tags.get(277, (1,))[0]
    bps = tags.get(258, (8,) * spp)
    rows_per_strip = tags.get(278, (h,))[0] or h
    offsets = tags.get(273)
    counts = tags.get(279)
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError("bad TIFF dimensions")
    if any(b != 8 for b in bps):
        raise ValueError(f"unsupported TIFF bits-per-sample {bps}")
    if offsets is None:
        raise ValueError("TIFF missing strip offsets")
    if counts is None:
        counts = (len(payload) - offsets[0],) * len(offsets)
    raw = bytearray()
    expected_total = w * h * spp
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, h - si * rows_per_strip)
        if strip_rows <= 0:
            break  # surplus strip entries in a malformed IFD
        strip_expected = strip_rows * w * spp
        chunk = payload[off : off + cnt]
        if comp == 1:
            raw += chunk[:strip_expected]
        elif comp in (8, 32946):
            raw += zlib.decompressobj().decompress(chunk, strip_expected + 1)[
                :strip_expected
            ]
        elif comp == 32773:
            raw += _packbits_decode(chunk, strip_expected)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
    if len(raw) < expected_total:
        raise ValueError("truncated TIFF pixel data")
    arr = np.frombuffer(bytes(raw[:expected_total]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if predictor == 2:
        # horizontal differencing: each sample is stored as the delta from
        # the previous pixel's same channel; undo with a mod-256 row cumsum
        arr = np.cumsum(arr.astype(np.int64), axis=1, dtype=np.int64) % 256
    img = arr.astype(np.float64)
    if photo in (0, 1):
        g = img[:, :, :1]
        if photo == 0:
            g = 255.0 - g  # MinIsWhite
        rgb = np.repeat(g, 3, axis=2)
    elif photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with < 3 samples")
        rgb = img[:, :, :3]  # alpha/extra samples dropped
    elif photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        lut = (np.array(cmap[: 3 * 256], dtype=np.float64).reshape(3, 256).T) / 257.0
        rgb = lut[img[:, :, 0].astype(np.intp)]
    else:
        raise ValueError(f"unsupported TIFF photometric {photo}")
    return w, h, float(8 * spp), rgb[:, :, ::-1]


def make_tiff(
    width: int,
    height: int,
    pixels_rgb,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: int = 1,
) -> bytes:
    """Serialize an 8-bit RGB TIFF for tests: compression 1 (none),
    8 (deflate), or 32773 (PackBits); multiple strips when
    ``rows_per_strip`` is set; either byte order; predictor 2 applies
    horizontal differencing before compression. Deterministic."""
    import struct
    import zlib

    fmt = ">" if big_endian else "<"
    rows = [list(r) for r in pixels_rgb]
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        body = b"".join(
            bytes(v for px in row for v in px) for row in rows[y0 : y0 + rps]
        )
        if predictor == 2:
            a = np.frombuffer(body, dtype=np.uint8).reshape(-1, width, 3).astype(np.int64)
            d = a.copy()
            d[:, 1:] = (a[:, 1:] - a[:, :-1]) % 256
            body = d.astype(np.uint8).tobytes()
        if compression == 8:
            body = zlib.compress(body)
        elif compression == 32773:
            # trivially valid PackBits: chunks of <=128 literal bytes
            raw = body
            body = b""
            for i in range(0, len(raw), 128):
                blk = raw[i : i + 128]
                body += bytes((len(blk) - 1,)) + blk
        strips.append(body)

    # layout: header(8) + IFD + values + strip data
    n_tags = 10
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    data_off = ifd_off + ifd_size
    # arrays that don't fit inline
    n_strips = len(strips)
    arr_off = data_off
    extra = b""
    if n_strips > 1:
        strip_off_pos = arr_off
        extra_len = 4 * n_strips * 2
        strip_data_start = arr_off + extra_len
    else:
        strip_data_start = arr_off
    offs = []
    pos = strip_data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n_strips > 1:
        extra = b"".join(struct.pack(fmt + "I", o) for o in offs) + b"".join(
            struct.pack(fmt + "I", len(s)) for s in strips
        )

    def entry(tag, typ, cnt, val):
        # inline values are LEFT-justified in the 4-byte field: a lone
        # SHORT packs as (H, H=0), not as a 4-byte int (differs on MM order)
        if typ == 3 and cnt == 1:
            packed = struct.pack(fmt + "HH", val, 0)
        else:
            packed = struct.pack(fmt + "I", val)
        return struct.pack(fmt + "HHI", tag, typ, cnt) + packed

    # BitsPerSample (3 SHORTs = 6 bytes) doesn't fit inline: it lives after
    # the strip data, at ``pos``
    bps_off = pos
    entries = [
        entry(256, 4, 1, width),
        entry(257, 4, 1, height),
        entry(258, 3, 3, bps_off),
        entry(259, 3, 1, compression),
        entry(262, 3, 1, 2),
        entry(273, 4, n_strips, offs[0] if n_strips == 1 else strip_off_pos),
        entry(277, 3, 1, 3),
        entry(278, 4, 1, rps),
        entry(279, 4, n_strips, len(strips[0]) if n_strips == 1 else strip_off_pos + 4 * n_strips),
        entry(317, 3, 1, predictor),
    ]
    out = struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, ifd_off)
    out += struct.pack(fmt + "H", n_tags)
    out += b"".join(sorted(entries, key=lambda e: struct.unpack_from(fmt + "H", e)[0]))
    out += struct.pack(fmt + "I", 0)  # next IFD
    out += extra
    out += b"".join(strips)
    out += struct.pack(fmt + "HHH", 8, 8, 8)
    return out


def jpeg_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for JPEG payloads (functions/jpeg.py: pure
    stdlib+numpy — Huffman entropy decode, dequant, 8x8 IDCT, chroma
    upsample, BT.601 YCbCr->RGB; 4:4:4/4:2:2/4:2:0, restart intervals).
    Baseline (incl. multi-scan sequential) AND progressive SOF2 streams
    decode; arithmetic/12-bit/lossless raise (callers fall back to
    fake_decode). The EXIF orientation tag is honored (camera photos
    store the sensor's native rotation), so width/height and band
    luminances describe the image as DISPLAYED. Feature layout:
    ``_bgr_features`` with bpp=24."""
    from logparserhelper_spark.functions.jpeg import (
        apply_exif_orientation,
        decode_jpeg,
        exif_orientation,
    )

    rgb = apply_exif_orientation(decode_jpeg(payload), exif_orientation(payload))
    h, w = rgb.shape[:2]
    return w, h, 24.0, rgb[:, :, ::-1]


def make_png(
    width: int,
    height: int,
    pixels,
    color_type: int = 2,
    palette_rgb=None,
    depth: int = 8,
    filters=None,
    interlaced: bool = False,
) -> bytes:
    """Serialize a PNG for tests: ``pixels`` is rows (top-first) of tuples
    sized to the color type (gray scalar for 0, (r,g,b) for 2, palette index
    for 3, (r,g,b,a) for 6). ``filters`` optionally gives a per-row filter
    type (0/1/2/3/4) so the decoder's unfilter paths are exercised; default
    all-0 (for Adam7 output the list is consumed per emitted sub-image row,
    cyclically). ``interlaced`` stores the image as the 7 Adam7 passes.
    Deterministic, stdlib-only."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    sb = depth // 8
    rows = [list(r) for r in pixels]
    filters = list(filters) if filters is not None else [0]

    def pack_sample(v: int) -> bytes:
        return struct.pack(">H", v) if depth == 16 else bytes((v,))

    def row_bytes(row) -> bytes:
        if depth < 8:  # pack MSB-first, zero-fill the final byte
            buf = 0
            n = 0
            out = bytearray()
            for v in row:
                buf = (buf << depth) | (int(v) & ((1 << depth) - 1))
                n += depth
                if n == 8:
                    out.append(buf)
                    buf = 0
                    n = 0
            if n:
                out.append(buf << (8 - n))
            return bytes(out)
        out = b""
        for px in row:
            vals = px if isinstance(px, (tuple, list)) else (px,)
            for v in vals:
                out += pack_sample(v)
        return out

    bpp = max(1, channels * sb)

    def row_stride(npix: int) -> int:
        return _png_row_stride(npix, channels, depth)

    def filter_rows(sub_rows, stride, ft_iter):
        prev = bytes(stride)
        scan = b""
        for row in sub_rows:
            line = row_bytes(row)
            ft = next(ft_iter)
            filt = bytearray(stride)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b_ = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 0:
                    pr = 0
                elif ft == 1:
                    pr = a
                elif ft == 2:
                    pr = b_
                elif ft == 3:
                    pr = (a + b_) >> 1
                else:
                    p = a + b_ - c
                    pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                filt[i] = (line[i] - pr) & 0xFF
            scan += bytes((ft,)) + bytes(filt)
            prev = line
        return scan

    import itertools

    ft_iter = itertools.cycle(filters)
    if interlaced:
        scan = b""
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = [row[x0::dx] for row in rows[y0::dy]]
            if not sub or not sub[0]:
                continue  # empty pass: no bytes at all
            scan += filter_rows(sub, row_stride(len(sub[0])), ft_iter)
    else:
        scan = filter_rows(rows, row_stride(width), ft_iter)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, 1 if interlaced else 0
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", b"".join(bytes(p) for p in palette_rgb))
    out += chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    return out


def _gif_lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list:
    """GIF-variant LZW decode (spec appendix F): LSB-first variable-width
    codes (min+1 .. 12 bits), Clear resets the table, EOI ends the stream.
    Returns the palette-index list (length capped at ``n_expected``)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    total_bits = len(data) * 8
    out: list = []
    dict_: list = []
    width = min_code_size + 1
    prev = None
    bitpos = 0

    def reset():
        nonlocal dict_, width, prev
        dict_ = [(i,) for i in range(clear)] + [None, None]
        width = min_code_size + 1
        prev = None

    reset()
    while bitpos + width <= total_bits and len(out) < n_expected:
        byte_i, bit_o = divmod(bitpos, 8)
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> bit_o) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:  # first code after a clear must be a literal
            if code >= clear:
                raise ValueError("bad GIF LZW stream (non-literal after clear)")
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
            if len(dict_) < 4096:  # table full -> deferred clear: stop growing
                dict_.append(prev + (entry[0],))
        elif code == len(dict_):  # the KwKwK case
            entry = prev + (prev[0],)
            if len(dict_) < 4096:
                dict_.append(entry)
        else:
            raise ValueError(f"bad GIF LZW code {code} (dict size {len(dict_)})")
        out.extend(entry)
        prev = entry
        if len(dict_) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_expected:
        raise ValueError("truncated GIF LZW stream")
    return out[:n_expected]


def gif_decode_bgr(payload: bytes) -> tuple:
    """REAL image decode for GIF87a/GIF89a payloads (pure stdlib): full LZW
    decompression (variable code width, clear/EOI, KwKwK case), global or
    local color table, Adam-style 4-pass deinterlace. First frame only;
    extension blocks (incl. GCE transparency) are skipped — means treat the
    transparent index as its palette color, which is the right call for
    content features. Feature layout: ``_bgr_features`` (bpp=8 since GIF is
    palettized). Anything malformed raises (callers fall back to
    fake_decode)."""
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + terminated sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _, _, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        iflags = payload[pos]
        pos += 1
        table = gct
        if iflags & 0x80:  # local color table overrides
            n = 2 << (iflags & 7)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image with no color table")
        if iw <= 0 or ih <= 0 or iw * ih > MAX_DECODE_PIXELS:
            raise ValueError("bad GIF dimensions")
        min_code = payload[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = np.array(
            _gif_lzw_decode(bytes(data), min_code, iw * ih), dtype=np.intp
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: stored rows are in 4-pass order
            order = [
                r
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(start, ih, step)
            ]
            disp = np.empty_like(idx)
            disp[order] = idx
            idx = disp
        if int(idx.max()) >= table.shape[0]:
            raise ValueError("GIF index beyond color table")
        rgb = table[idx].astype(np.float64)
        return iw, ih, 8.0, rgb[:, :, ::-1]
    raise ValueError("no image data in GIF")


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW encode mirroring ``_gif_lzw_decode``'s width-growth
    rule (both bump when the table reaches 2^width), resetting at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    def fresh_table():
        return {(i,): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    emit(clear)
    seq: tuple = ()
    for k in indices:
        cand = seq + (int(k),)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (int(k),)
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def make_gif(width, height, palette_rgb, pixels_idx, interlaced=False) -> bytes:
    """Serialize a single-frame GIF89a for tests: ``palette_rgb`` is a list
    of (r,g,b) (padded to a power of two >=4), ``pixels_idx`` rows
    (top-first) of palette indices. Real LZW compression so the decoder's
    dictionary path is exercised."""
    import struct

    pal = list(palette_rgb)
    size_pow = 2
    while (1 << size_pow) < max(4, len(pal)):
        size_pow += 1
    pal = pal + [(0, 0, 0)] * ((1 << size_pow) - len(pal))
    rows = [list(r) for r in pixels_idx]
    if interlaced:
        order = [
            r
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for r in range(start, height, step)
        ]
        rows = [rows[r] for r in order]
    flat = [i for row in rows for i in row]
    min_code = max(2, size_pow)
    lzw = _gif_lzw_encode(flat, min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | ((size_pow - 1) & 7), 0, 0)
    out += b"".join(bytes(p) for p in pal)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlaced else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        blk = lzw[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3B"
    return bytes(out)


def make_bmp8(width: int, height: int, palette_rgb, pixels_idx) -> bytes:
    """Serialize an 8-bit palettized bottom-up BMP: ``palette_rgb`` is a list
    of (r, g, b) tuples (<=256), ``pixels_idx`` an iterable of rows
    (top-first) of palette indices. Used by tests to prove bmp_decode maps
    indices through the color table rather than reading them as gray."""
    import struct

    pal = list(palette_rgb)
    rows = [list(r) for r in pixels_idx]
    stride = (width + 3) & ~3
    pad = b"\x00" * (stride - width)
    body = b"".join(bytes(row) + pad for row in reversed(rows))  # bottom-up
    pal_bytes = b"".join(bytes((b, g, r, 0)) for (r, g, b) in pal)
    off = 14 + 40 + len(pal_bytes)
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                      len(body), 2835, 2835, len(pal), 0)
    return header + dib + pal_bytes + body


# ---- feature wrappers over the pixel-returning decoders -------------------
# Each *_decode_bgr returns (width, height, bits_per_pixel, bgr) with bgr an
# (h, w, 3) float64 array of 0..255 channel values; the *_decode wrappers
# keep the original FEATURE_DIM-float contract. Pixel access exists for the
# perceptual-hash operator (phash64), which needs real image content, not
# the 16-float summary.


def bmp_decode(payload: bytes) -> np.ndarray:
    return _bgr_features(*bmp_decode_bgr(payload))


def ppm_decode(payload: bytes) -> np.ndarray:
    return _bgr_features(*ppm_decode_bgr(payload))


def png_decode(payload: bytes) -> np.ndarray:
    return _bgr_features(*png_decode_bgr(payload))


def gif_decode(payload: bytes) -> np.ndarray:
    return _bgr_features(*gif_decode_bgr(payload))


def jpeg_decode(payload: bytes) -> np.ndarray:
    return _bgr_features(*jpeg_decode_bgr(payload))


def tiff_decode(payload: bytes) -> np.ndarray:
    return _bgr_features(*tiff_decode_bgr(payload))


def webp_decode(payload: bytes) -> np.ndarray:
    from logparserhelper_spark.functions.webp import webp_decode_bgr

    return _bgr_features(*webp_decode_bgr(payload))


def _webp_decode_bgr(payload: bytes) -> tuple:
    from logparserhelper_spark.functions.webp import webp_decode_bgr

    return webp_decode_bgr(payload)


_IMAGE_DECODERS_BGR = (
    (lambda p: len(p) >= 54 and p[:2] == b"BM", bmp_decode_bgr),
    (lambda p: p[:2] == b"P6", ppm_decode_bgr),
    (lambda p: p[:8] == b"\x89PNG\r\n\x1a\n", png_decode_bgr),
    (lambda p: p[:6] in (b"GIF87a", b"GIF89a"), gif_decode_bgr),
    (lambda p: p[:3] == b"\xff\xd8\xff", jpeg_decode_bgr),
    (lambda p: p[:4] in (b"II*\x00", b"MM\x00*"), tiff_decode_bgr),
    # lossless WebP (VP8L) is REAL; lossy 'VP8 ' raises inside and stays
    # on the labeled fake fallback (the documented codec gap)
    (lambda p: len(p) >= 16 and p[:4] == b"RIFF" and p[8:12] == b"WEBP", _webp_decode_bgr),
)


def auto_decode_bgr(payload: bytes) -> tuple:
    """Pixel-level dispatch on container magic: (w, h, bpp, bgr) for any
    supported IMAGE container. Raises for audio/unknown payloads — pixel
    consumers (phash) have no meaningful fake path; callers skip/null."""
    if payload is None:
        raise ValueError("null payload")
    for sniff, dec in _IMAGE_DECODERS_BGR:
        if sniff(payload):
            return dec(payload)
    raise ValueError("not a supported image container")


def _gray_resize(bgr: np.ndarray, size: int = 32) -> np.ndarray:
    """Deterministic area-mean downscale of the luminance plane ((B+G+R)/3)
    to size x size: output cell (r, c) is the mean of input rows
    [floor(r*h/size), max(that+1, floor((r+1)*h/size))) x the analogous
    column range — no interpolation kernel, no resampling library, fully
    reproducible. Images smaller than ``size`` repeat source cells."""
    lum = bgr.mean(axis=2)
    h, w = lum.shape
    rb = (np.arange(size + 1) * h) // size
    cb = (np.arange(size + 1) * w) // size
    out = np.empty((size, size), dtype=np.float64)
    for r in range(size):
        r0, r1 = rb[r], max(rb[r] + 1, rb[r + 1])
        band = lum[r0:r1]
        for c in range(size):
            c0, c1 = cb[c], max(cb[c] + 1, cb[c + 1])
            out[r, c] = band[:, c0:c1].mean()
    return out


def _dct2(a: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II (the JPEG/pHash transform) via two matrix
    products: D @ a @ D.T with D[k,n] = s_k * cos(pi*(2n+1)*k/(2N))."""
    n = a.shape[0]
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d @ a @ d.T


def phash64_from_bgr(bgr: np.ndarray) -> int:
    """64-bit perceptual hash (the classic pHash recipe): luminance ->
    32x32 area-mean resize -> 2-D DCT -> keep the 8x8 low-frequency block
    -> threshold each coefficient against the MEDIAN of the 63 non-DC
    coefficients (odd count, so the median is an exact element — no
    averaging, no tie-at-the-boundary ambiguity) -> pack row-major,
    MSB-first, reinterpreted as a signed int64. Coefficients are quantized
    to 1e-6 BEFORE the median/threshold so an independently-coded DCT
    (different op order, last-ulp differences) produces the identical
    hash — what lets the contract oracle re-derive expected hashes from
    its own implementation. Perceptually identical
    images (same pixels through different lossless containers, or a
    JPEG re-encode) land at Hamming distance ~0-3; unrelated images at
    ~32."""
    coeffs = np.round(_dct2(_gray_resize(bgr, 32))[:8, :8].ravel(), 6)
    med = float(np.sort(coeffs[1:])[31])
    bits = coeffs > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def phash64(payload: bytes) -> int:
    """pHash of any supported image container (via auto_decode_bgr);
    raises on undecodable payloads — callers null/skip."""
    _w, _h, _bpp, bgr = auto_decode_bgr(payload)
    return phash64_from_bgr(bgr)


# worker-lifetime cache for repeated payloads (module level so it survives
# across Arrow batches; fixture-style corpora repeat blobs heavily and a
# miss costs a full decode + DCT). Bounded, keyed by the payload bytes.
# Defined as its own decorated function (not lru_cache(phash64)): the
# wrapper must carry THIS name for cloudpickle's pickle-by-reference.
from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=256)
def phash64_cached(payload: bytes) -> int:
    return phash64(payload)


def image_phash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, phash) per row: decode + hash inside an Arrow-batched pandas
    UDF (per-blob Python is inherent for pure-stdlib codecs; one Arrow
    crossing, no shuffle). Undecodable/null payloads yield null phash so
    mixed corpora don't poison the stage."""

    @F.pandas_udf("bigint")
    def ph(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads.tolist():
            try:
                # module-level cache: warm across Arrow batches for the
                # worker's lifetime, not rebuilt per batch
                out.append(phash64_cached(bytes(p)))
            except Exception:
                out.append(None)
        return pd.Series(out, index=payloads.index, dtype="object")

    return df.select(F.col(id_col).alias("id"), ph(F.col(payload_col)).alias("phash"))


def _hash_near_pairs(sig: DataFrame, max_hamming: int) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(hash) <= max_hamming over
    an (id, phash) table, via chunk bucketing: the 64-bit hash splits into
    ``max_hamming + 1`` contiguous bit ranges, so by pigeonhole any pair
    within the distance budget agrees exactly on at least one chunk
    (same O(n)-shuffle plan shape as dedup.simhash_near_pairs; candidates
    only meet inside a shared chunk bucket, never all-pairs). The default
    d<=3 therefore buckets on 4x16-bit chunks; larger budgets widen the
    explode fan-out (and recall cost) instead of silently missing pairs."""
    if not 0 <= max_hamming <= 16:
        # n_chunks = d+1 caps at 17 before chunks shrink below ~4 bits and
        # the buckets stop discriminating (every value collides).
        raise ValueError(f"max_hamming must be in [0, 16], got {max_hamming}")
    n_chunks = max_hamming + 1
    bounds = [round(64 * i / n_chunks) for i in range(n_chunks + 1)]

    def _ckey(c: int):
        width = bounds[c + 1] - bounds[c]
        shifted = F.shiftright("phash", bounds[c])
        if width >= 64:  # d=0: the whole hash is the (exact-match) bucket key
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    chunks = sig.select(
        "id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("chunk"), _ckey(c).alias("ckey"))
                for c in range(n_chunks)
            ])
        ).alias("ck"),
    ).select("id", "phash", F.col("ck.chunk").alias("chunk"), F.col("ck.ckey").alias("ckey"))
    a = chunks.select(F.col("id").alias("id_a"), F.col("phash").alias("ph_a"), "chunk", "ckey")
    b = chunks.select(F.col("id").alias("id_b"), F.col("phash").alias("ph_b"), "chunk", "ckey")
    cand = (
        a.join(b, ["chunk", "ckey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def phash_near_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: decode+hash (image_phash)
    then the banded Hamming join (_hash_near_pairs)."""
    sig = image_phash(df, payload_col, id_col).filter(F.col("phash").isNotNull())
    return _hash_near_pairs(sig, max_hamming)


def phash_dup_clusters(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    broadcast_threshold_bytes: int = 64 << 20,
) -> DataFrame:
    """Perceptual duplicate CLUSTERS — the end-to-end image-dedup shape:
    (id, phash, component) with component = min id reachable through
    Hamming<=max_hamming links. Exact-hash groups collapse to ONE
    representative (min id) BEFORE the banded near-pair join, so a
    million byte-identical or re-encoded copies contribute one node —
    never quadratic pairs; connected components (label propagation,
    dedup.connected_components) then merge representatives within
    max_hamming, and exact members re-expand onto their representative's
    component. Because each representative is already the min id of its
    exact group, the component label is the cluster's global min id.

    Skew note: the final re-expand join keys on ``phash``, so a corpus
    where one exact hash dominates (billions of identical blank images)
    makes that join skewed. It is a LINEAR hash-join — the quadratic
    stages (pairs, CC) see one node per distinct hash regardless — and
    rep_comp carries one row per DISTINCT hash, so after a heavy exact
    collapse it is typically broadcast-sized (no shuffle, no skew); when
    it is not, AQE skew-split handles the residual imbalance (pinned by
    tests/test_functions.py's hot-hash fixture)."""
    from logparserhelper_spark.functions.dedup import connected_components

    # localCheckpoint (eager): sig's lineage is the per-blob decode + DCT
    # hash — the cost center of the whole op — and three branches below
    # (reps, the CC pair derivation, and the final re-expand join) would
    # otherwise each re-decode the corpus. Checkpoint rather than persist
    # so the cached (id, long) blocks are reclaimed by the ContextCleaner
    # once the returned DataFrame is GC'd — an explicit persist here
    # stayed pinned for the session after the query completed. TRADEOFF:
    # the truncated lineage means losing an executor that holds checkpoint
    # blocks fails the query instead of recomputing those partitions (same
    # exposure connected_components already accepts per round); on a
    # preemptible-heavy cluster, rerunning the op is the recovery path.
    sig = (
        image_phash(df, payload_col, id_col)
        .filter(F.col("phash").isNotNull())
        .localCheckpoint()
    )
    reps = sig.groupBy("phash").agg(F.min("id").alias("rep_id"))
    pairs = _hash_near_pairs(
        reps.select(F.col("rep_id").alias("id"), "phash"), max_hamming
    )
    comp = connected_components(pairs)
    rep_comp = (
        reps.join(comp, reps.rep_id == comp.id, "left")
        .select("phash", F.coalesce("component", "rep_id").alias("component"))
    )
    # re-expand join sizing: rep_comp is one (long, long) row per DISTINCT
    # hash. When that is broadcast-sized, broadcasting it means the (huge,
    # possibly hot-key-skewed) sig side is never shuffled on phash at all —
    # a billion identical blank images flow map-side. AQE cannot make this
    # call here: the checkpoint boundary hides runtime stats, so the join
    # would stay a phash-keyed sort-merge (verified on executed plans). The
    # count is one cheap pass over the already-materialized sig blocks.
    # The cutoff is sized in estimated BYTES, not rows: ~32B per hashed-
    # relation row (two longs + entry overhead) against a dedicated knob
    # (default 64 MB ≈ 2M distinct hashes — deliberately above Spark's
    # 10MB autoBroadcast default because we KNOW the alternative is a
    # skew-prone SMJ, but bounded so a large distinct-hash corpus cannot
    # OOM the driver). Above it per-key fan-in is tiny by construction
    # (rows/distinct-hash ~ 1), so the plain shuffle join with AQE
    # skew-split is the right plan.
    n_reps = reps.count()
    if n_reps * 32 <= broadcast_threshold_bytes:
        rep_comp = F.broadcast(rep_comp)
    return sig.join(rep_comp, "phash").select("id", "phash", "component")


def auto_decode(payload: bytes) -> np.ndarray:
    """Default decoder: dispatch on container magic — the SAME sniffing
    table the pixel path uses (_IMAGE_DECODERS_BGR), features via
    _bgr_features. RIFF/WAVE -> real stdlib audio decode; unknown or
    failing payloads -> deterministic fake."""
    if (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        try:
            return wav_decode(payload)
        except Exception:
            return fake_decode(payload)
    if payload is not None:
        for sniff, dec in _IMAGE_DECODERS_BGR:
            if sniff(payload):
                try:
                    return _bgr_features(*dec(payload))
                except Exception:
                    return fake_decode(payload)
    return fake_decode(payload)


def extract_media_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """payload -> feature vector via mapInPandas. Output: (media_id, kind,
    n_bytes, features array<float>). Batches iterate lazily so only one Arrow
    batch of payloads is resident per worker at a time."""
    decode = decode_fn or auto_decode
    out_schema = "media_id long, kind string, n_bytes int, features array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in decode(p)] if p is not None else None
                for p in pdf["payload"].tolist()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(gen, schema=out_schema)


def make_avi(frames_jpeg: list, width: int, height: int, fps: int = 10) -> bytes:
    """Serialize a minimal Motion-JPEG AVI (RIFF 'AVI ': hdrl with
    avih/strh/strf, movi with one '00dc' chunk per JPEG frame, even-byte
    chunk padding) — the standard MJPEG-in-AVI layout (msdn AVI RIFF
    spec / OpenDML). Test/fixture writer for avi_frames."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    n = len(frames_jpeg)
    max_sz = max((len(f) for f in frames_jpeg), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,      # dwMaxBytesPerSec
        0, 0x10,           # padding, AVIF_HASINDEX-less but fine
        n, 0, 1, max_sz,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I2H8I", 0, 0, 0, 0, 1, fps, 0, n, max_sz, 10000, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(  # BITMAPINFOHEADER: 11 fields, biCompression='MJPG'
        "<I2i2H2I2i2I", 40, width, height, 1, 24, 0x47504A4D,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames_jpeg))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frames(payload: bytes):
    """REAL video-container parse for Motion-JPEG AVI payloads (pure
    stdlib ``struct``): walks the RIFF chunk tree, reads the frame period
    from avih, and yields (frame_idx, frame_ms, jpeg_bytes) for every
    '00dc'/'00db' chunk in the movi LIST. Raises on anything that is not
    a RIFF/AVI or has no movi frames (callers fall back / null out).
    Frame pixels come from this repo's own decode_jpeg — end-to-end
    video decode with no codec library."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    micro_per_frame = None
    frames = []
    buf = payload
    # explicit-stack DFS over the chunk tree: hostile payloads can nest
    # LIST chunks one per 12 bytes, so recursing would hit the interpreter
    # recursion limit mid-walk — the stack depth here is bounded by the
    # number of ANCESTOR lists only, and a crafted million-deep nest costs
    # heap, not C stack. Child chunks are walked before resuming after the
    # list, so frame order is identical to the recursive walk.
    stack = [(12, len(payload))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            data_start = pos + 8
            data_end = min(data_start + size, end)
            next_pos = data_start + size + (size % 2)  # chunks pad to even
            if fourcc == b"LIST":
                stack.append((next_pos, end))  # resume here after the list
                pos, end = data_start + 4, data_end  # descend (skip list kind)
                continue
            if fourcc == b"avih" and size >= 4:
                (micro_per_frame,) = struct.unpack_from("<I", buf, data_start)
            elif fourcc in (b"00dc", b"00db") and size > 0:
                frames.append(bytes(buf[data_start:data_end]))
            pos = next_pos
    if not frames:
        raise ValueError("AVI contains no video frames")
    ms = (micro_per_frame or 100_000) / 1000.0
    for i, f in enumerate(frames):
        yield i, int(i * ms), f


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 1,
) -> DataFrame:
    """REAL frame sampling for MJPEG AVI payloads: parse the container,
    decode every ``every_n``-th frame through this repo's decode_jpeg,
    emit (media_id, frame_idx, frame_ms, features array<float>) with the
    shared _bgr_features layout per frame. mapInPandas with lazily
    iterated batches (one Arrow batch of payloads resident per worker);
    undecodable payloads or frames yield no rows — mixed corpora don't
    poison the stage."""
    out_schema = "media_id long, frame_idx int, frame_ms int, features array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ms": [], "features": []}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                try:
                    frame_iter = list(avi_frames(bytes(p)))
                except Exception:
                    continue
                for idx, ms, jpg in frame_iter:
                    if idx % every_n:
                        continue
                    try:
                        # the still-image JPEG path end to end (incl. EXIF
                        # orientation) — identical frame bytes must yield
                        # identical features through either entry point
                        feats = _bgr_features(*jpeg_decode_bgr(jpg))
                    except Exception:
                        continue
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ms"].append(ms)
                    rows["features"].append([float(x) for x in feats])
            if rows["media_id"]:  # empty pdf infers float64 for the list col
                yield pd.DataFrame(
                    {
                        "media_id": rows["media_id"],
                        "frame_idx": rows["frame_idx"],
                        "frame_ms": rows["frame_ms"],
                        "features": pd.Series(rows["features"], dtype="object"),
                    }
                )

    return df.mapInPandas(gen, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: expands each video row into one row per
    sampled frame offset (real decode NotImplemented; offsets computed from
    metadata so partition fan-out is realistic)."""
    out_schema = "media_id long, frame_ms int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_ms": [], "frame": []}
            for mid, kind, dur in zip(pdf["media_id"], pdf["kind"], pdf["duration_ms"]):
                if kind != "video" or dur is None:
                    continue
                for off in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ms"].append(off)
                    rows["frame"].append(None)  # real decoder would put frame bytes
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=out_schema)


def media_read_conf(avg_payload_bytes: int, budget_bytes: int = 256 << 20) -> dict:
    """Suggested confs so one scan partition of media rows fits the budget."""
    rows_per_batch = max(1, budget_bytes // max(1, avg_payload_bytes) // 4)
    return {
        "spark.sql.files.maxPartitionBytes": str(budget_bytes),
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(rows_per_batch),
    }
