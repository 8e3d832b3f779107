"""Pure-stdlib/numpy media codecs for the multimodal surface.

The container decode step was a ``fake_decode=True`` stand-in through
round 7 because the usual codec libraries (Pillow, soundfile, ffmpeg)
are not installed here. These container formats need nothing but
``struct`` + stdlib ``zlib`` + numpy, so they get REAL encoders and
decoders, making the
``extract_features`` / ``media_meta`` production path exercise genuine
container bytes end-to-end:

- **BMP**: 24-bit uncompressed ``BI_RGB`` with a ``BITMAPINFOHEADER``
  (the plain Windows bitmap every image tool can write). Bottom-up and
  top-down row orders, 4-byte row padding.
- **PPM**: binary ``P6``, maxval 255 (netpbm), comment-tolerant header.
- **PNG** (rounds 9-10): 8/16-bit gray, gray+alpha, truecolor RGB/RGBA
  and 8-bit palette (PLTE/tRNS), sequential and Adam7-interlaced — the
  single most common real-world image container. Pure stdlib ``zlib``
  (DEFLATE + crc32) + numpy: the decoder verifies chunk CRCs, walks the
  IDAT stream (inflate bounded by the expected pixel-stream size, so
  decompression bombs raise instead of exhausting memory), and
  reconstructs all five scanline filter types (None / Sub / Up /
  Average / Paeth) at the spec's byte-level filter distance; the
  encoder emits filter-0 scanlines (decode of our own output is then a
  straight memcpy). Sub-byte depths (1/2/4-bit) raise
  ``NotImplementedError``.
- **WAV**: RIFF PCM (format tag 1), 8/16/32-bit integer samples, any
  channel count; chunk-walking decoder tolerates extra chunks (LIST,
  fact, ...).

Anything else still raises ``NotImplementedError`` at the call site —
the guard the multimodal surface has always advertised for codecs this
environment cannot host (extension surface; the reference is CSV-only,
/root/reference/main.py:94-95).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- sniff

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff(buf: bytes) -> str | None:
    """Container kind from magic bytes: 'bmp'|'ppm'|'png'|'wav'|None."""
    if len(buf) >= 2 and buf[:2] == b"BM":
        return "bmp"
    if len(buf) >= 2 and buf[:2] == b"P6":
        return "ppm"
    if len(buf) >= 8 and buf[:8] == _PNG_SIG:
        return "png"
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------ BMP

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HDR = "<IiiHHIIiiII"  # size, w, h, planes, bpp, comp, imgsize, xppm, yppm, clrused, clrimp


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up, rows padded
    to 4 bytes — the canonical layout)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = struct.calcsize(_BMP_FILE_HDR) + struct.calcsize(_BMP_INFO_HDR)
    hdr = struct.pack(_BMP_FILE_HDR, b"BM", off + len(data), 0, 0, off)
    info = struct.pack(_BMP_INFO_HDR, 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + info + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB. Handles bottom-up
    (positive height) and top-down (negative height) row order and the
    4-byte row padding; anything fancier (palettes, compression, other
    bit depths) raises NotImplementedError."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (_, _, _, _, off) = struct.unpack_from(_BMP_FILE_HDR, buf, 0)
    (hsz, w, h, _planes, bpp, comp, *_rest) = struct.unpack_from(
        _BMP_INFO_HDR, buf, struct.calcsize(_BMP_FILE_HDR)
    )
    if hsz < 40 or bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BI_RGB BMP supported (bpp={bpp}, "
            f"compression={comp}, header={hsz})"
        )
    topdown = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    need = off + stride * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP: {len(buf)} < {need} bytes")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


# ------------------------------------------------------------------ PPM


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary P6 PPM, maxval 255."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) uint8 RGB")
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8 RGB. Header fields may be
    separated by any whitespace and interleaved with '#' comments per
    the netpbm spec; only maxval 255 is supported."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval, then raw data
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"only maxval 255 PPM supported (got {maxval})")
    need = w * h * 3
    if len(buf) - pos < need:
        raise ValueError(f"truncated PPM: {len(buf) - pos} < {need} data bytes")
    return (
        np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# ------------------------------------------------------------------ PNG


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


_PNG_CTYPE_BY_CH = {1: 0, 2: 4, 3: 2, 4: 6}  # gray, gray+A, RGB, RGBA
_PNG_CH_BY_CTYPE = {v: k for k, v in _PNG_CTYPE_BY_CH.items()}


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w[, ch]) uint8/uint16 → 8- or 16-bit PNG (dtype picks the bit
    depth; 16-bit samples are written big-endian per the spec). Channel
    count picks the color type: 1 → grayscale (0), 2 → gray+alpha (4),
    3 → truecolor (2), 4 → RGBA (6); a 2-D array is treated as
    grayscale. ``interlace=True`` emits the seven Adam7 passes. Every
    scanline uses filter 0 (None): DEFLATE already removes most
    redundancy at these sizes and the decode of our own output stays a
    straight memcpy."""
    src = np.asarray(pixels)
    if src.dtype == np.uint16:
        depth, wire = 16, ">u2"
    elif src.dtype == np.uint8:
        depth, wire = 8, np.uint8
    else:
        raise ValueError(f"encode_png expects uint8 or uint16 pixels, got {src.dtype}")
    px = src
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _PNG_CTYPE_BY_CH:
        raise ValueError("encode_png expects (h, w, 1|2|3|4) pixels")
    h, w, ch = px.shape
    ctype = _PNG_CTYPE_BY_CH[ch]
    wire_px = np.ascontiguousarray(px.astype(wire))
    if not interlace:
        raw = b"".join(b"\x00" + wire_px[y].tobytes() for y in range(h))
    else:
        parts = []
        for x0, y0, dx, dy, _pw, ph in _adam7_passes(w, h):
            sub = np.ascontiguousarray(wire_px[y0::dy, x0::dx])
            parts.extend(b"\x00" + sub[y].tobytes() for y in range(ph))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray, palette: np.ndarray, trns: bytes | None = None
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → color-type-3
    PNG (8-bit, non-interlaced, filter-0 scanlines). ``trns`` appends a
    tRNS alpha chunk (entries past its length default to opaque 255 per
    the spec, which the decoder honors)."""
    ix = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if ix.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("encode_png_palette expects (h, w) indices and (n, 3) palette")
    if int(ix.max(initial=0)) >= len(pal):
        raise ValueError(f"palette index {int(ix.max())} out of range ({len(pal)})")
    h, w = ix.shape
    raw = b"".join(b"\x00" + ix[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return out + _png_chunk(b"IDAT", zlib.compress(raw, 6)) + _png_chunk(b"IEND", b"")


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int, pos: int = 0) -> np.ndarray:
    """Reconstruct ``h`` scanlines of ``stride`` bytes starting at byte
    ``pos`` per the PNG filter spec (all five types). ``bpp`` is the
    filter distance in BYTES (channels × bytes-per-sample — filters
    always operate on bytes regardless of bit depth, per the spec).
    Filter 0 is a memcpy, 1 (Sub) a per-lane cumsum mod 256, 2 (Up) a
    wrapping add of the prior row; 3 (Average) and 4 (Paeth) carry an
    intra-row recurrence and run per-pixel — acceptable because our own
    encoder emits filter 0 and foreign Average/Paeth rows are decoded
    correctly, just not at memcpy speed. Returns (h, stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            out[y] = (
                np.cumsum(line.reshape(stride // bpp, bpp).astype(np.uint64), axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft == 2:  # Up (uint8 add wraps mod 256 per the spec)
            out[y] = line + prev
        elif ft == 3:  # Average
            o = out[y]
            for x in range(stride):
                a = int(o[x - bpp]) if x >= bpp else 0
                o[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            o = out[y]
            for x in range(stride):
                a = int(o[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft} on row {y}")
    return out


# Adam7 pass grid: (x0, y0, dx, dy) for the seven interlace passes.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int):
    """Non-empty Adam7 pass geometries: (x0, y0, dx, dy, pw, ph)."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def _inflate_bounded(chunks, need: int) -> bytes:
    """Inflate the concatenated IDAT bodies, refusing to produce more
    than ``need`` bytes — a tiny crafted stream whose DEFLATE payload
    expands to gigabytes (decompression bomb) raises ValueError instead
    of exhausting memory on the untrusted media path."""
    dec = zlib.decompressobj()
    out = bytearray()
    for body in chunks:
        data = bytes(body)
        while data:
            out += dec.decompress(data, max(1, need + 1 - len(out)))
            if len(out) > need:
                raise ValueError(
                    f"PNG pixel stream exceeds expected {need} bytes "
                    f"(decompression bomb?)"
                )
            data = dec.unconsumed_tail
    out += dec.flush(max(1, need + 1 - len(out)))
    if len(out) > need:
        raise ValueError(
            f"PNG pixel stream exceeds expected {need} bytes (decompression bomb?)"
        )
    return bytes(out)


def decode_png(buf: bytes) -> np.ndarray:
    """8- and 16-bit gray / gray+alpha / truecolor / RGBA / 8-bit
    palette PNG → (h, w, 1|2|3|4) uint8 (or uint16 for depth 16), both
    sequential and Adam7-interlaced. Chunk CRCs are verified (a cut-off
    or bit-rotted download fails loudly, like the other decoders); all
    five scanline filters reconstruct, operating at the byte level with
    the depth-scaled filter distance per the spec. Palette images
    (color type 3, depth 8) decode through the PLTE lookup to RGB —
    RGBA when a tRNS alpha chunk is present. Sub-byte depths (1/2/4)
    raise NotImplementedError. The IDAT inflate is bounded by the
    expected pixel-stream size, so a crafted decompression bomb raises
    instead of exhausting memory."""
    if len(buf) < 8 or buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat, ended = 8, None, [], False
    plte, trns = None, None
    while pos + 8 <= len(buf):
        ln = struct.unpack_from(">I", buf, pos)[0]
        tag = buf[pos + 4 : pos + 8]
        if pos + 12 + ln > len(buf):
            raise ValueError(
                f"truncated PNG: chunk {tag!r} claims {ln} bytes, "
                f"{len(buf) - pos - 12} remain"
            )
        body = buf[pos + 8 : pos + 8 + ln]
        crc = struct.unpack_from(">I", buf, pos + 8 + ln)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"malformed IHDR ({len(body)} bytes, expected 13)")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + ln
    if ihdr is None or not idat or not ended:
        raise ValueError("PNG stream missing IHDR/IDAT/IEND chunk")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"invalid PNG IHDR (compression={comp}, filter={filt})")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG IHDR (interlace={interlace})")
    paletted = ctype == 3
    if (
        depth not in (8, 16)
        or (ctype not in _PNG_CH_BY_CTYPE and not paletted)
        or (paletted and depth != 8)
    ):
        raise NotImplementedError(
            f"only 8/16-bit gray/truecolor and 8-bit palette PNG supported "
            f"(depth={depth}, color type={ctype})"
        )
    if w == 0 or h == 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    # palette scanlines carry one index byte per pixel; the filters
    # operate on those index bytes (bpp=1), lookup happens after
    ch = 1 if paletted else _PNG_CH_BY_CTYPE[ctype]
    bps = depth // 8  # bytes per sample; filter distance is ch * bps
    bpp = ch * bps
    if interlace == 0:
        stride = w * bpp
        need = h * (1 + stride)
        raw = _inflate_bounded(idat, need)
        if len(raw) != need:
            raise ValueError(f"PNG pixel stream {len(raw)} bytes, expected {need}")
        flat = _png_unfilter(raw, h, stride, bpp)
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        passes = list(_adam7_passes(w, h))
        need = sum(ph * (1 + pw * bpp) for *_xy, pw, ph in passes)
        raw = _inflate_bounded(idat, need)
        if len(raw) != need:
            raise ValueError(f"PNG pixel stream {len(raw)} bytes, expected {need}")
        full = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in passes:
            sub = _png_unfilter(raw, ph, pw * bpp, bpp, pos=off)
            off += ph * (1 + pw * bpp)
            full[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        flat = full.reshape(h, w * bpp)
    if depth == 16:
        # samples are big-endian uint16 pairs
        px = (
            np.ascontiguousarray(flat)
            .view(">u2")
            .reshape(h, w, ch)
            .astype(np.uint16)
        )
        return px
    px = flat.reshape(h, w, ch)
    if not paletted:
        return px
    if plte is None or len(plte) == 0 or len(plte) % 3:
        raise ValueError("palette PNG with missing or malformed PLTE chunk")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max()) >= len(pal):
        raise ValueError(
            f"palette index {int(idx.max())} out of range ({len(pal)} entries)"
        )
    if trns is None:
        return pal[idx]
    alpha = np.full(len(pal), 255, dtype=np.uint8)
    ta = np.frombuffer(trns, dtype=np.uint8)
    if len(ta) > len(pal):
        raise ValueError("tRNS chunk longer than the palette")
    alpha[: len(ta)] = ta
    return np.dstack([pal[idx], alpha[idx]])


# ------------------------------------------------------------------ WAV

_WAV_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Integer PCM samples → RIFF/WAVE. ``samples`` is (n,) mono or
    (n, channels); dtype uint8 / int16 / int32 selects the bit depth."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    dt = {np.dtype("uint8"): 8, np.dtype("int16"): 16, np.dtype("int32"): 32}.get(
        s.dtype
    )
    if dt is None:
        raise ValueError(f"unsupported sample dtype {s.dtype}: use uint8/int16/int32")
    n, ch = s.shape
    data = np.ascontiguousarray(s.astype(s.dtype.newbyteorder("<"))).tobytes()
    block = ch * dt // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, dt)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → ((n, channels) int array, sample_rate). Walks the
    chunk list (skipping LIST/fact/...); only format tag 1 (integer PCM)
    at 8/16/32 bits is supported."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + size > len(buf):
            # a size field past the buffer is the common real-world
            # corruption (cut-off download) — fail loudly like the BMP/
            # PPM decoders instead of silently decoding fewer samples
            raise ValueError(
                f"truncated WAV: chunk {cid!r} claims {size} bytes, "
                f"{len(buf) - pos - 8} remain"
            )
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV stream missing fmt/data chunk")
    tag, ch, rate, _byterate, _block, bits = fmt
    if tag != 1 or bits not in _WAV_DTYPES:
        raise NotImplementedError(
            f"only integer PCM WAV supported (format tag {tag}, {bits}-bit)"
        )
    if ch < 1:
        raise ValueError(f"invalid WAV fmt: {ch} channels")
    arr = np.frombuffer(data, dtype=_WAV_DTYPES[bits])
    n = arr.size // ch * ch
    return arr[:n].reshape(-1, ch).copy(), rate


# ------------------------------------------------------- decode dispatch


def decode_media(buf: bytes) -> dict:
    """Sniff + decode one payload. Returns a uniform metadata dict:

    ``kind`` ('bmp'|'ppm'|'png'|'wav'), ``width``/``height``/``channels``,
    ``sample_rate`` (0 for images), ``n_samples`` (decoded scalar count:
    h*w*channels for images, frames*channels for audio), ``content_sum`` (exact
    integer sum of the DECODED scalars — container headers and BMP row
    padding excluded, which is what distinguishes a real decode from a
    raw byte pass), and ``content`` (the decoded ndarray).

    Unknown containers raise ``NotImplementedError`` — the advertised
    guard for codecs this environment cannot host.
    """
    kind = sniff(bytes(buf))
    if kind in ("bmp", "ppm", "png"):
        px = {"bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png}[kind](
            bytes(buf)
        )
        return {
            "kind": kind,
            "width": px.shape[1],
            "height": px.shape[0],
            "channels": px.shape[2],
            "sample_rate": 0,
            "n_samples": int(px.size),
            "content_sum": int(px.sum(dtype=np.int64)),
            "content": px,
        }
    if kind == "wav":
        samples, rate = decode_wav(bytes(buf))
        return {
            "kind": kind,
            "width": 0,
            "height": 0,
            "channels": samples.shape[1],
            "sample_rate": rate,
            "n_samples": int(samples.size),
            "content_sum": int(samples.sum(dtype=np.int64)),
            "content": samples,
        }
    raise NotImplementedError(
        f"unsupported container (magic {bytes(buf)[:4]!r}): only "
        f"BMP/PPM/PNG/WAV decode in this environment; other codecs need "
        f"libraries not installed here"
    )
