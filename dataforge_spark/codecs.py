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
  straight memcpy). Sub-byte depths (1/2/4-bit gray and palette —
  round 11) pack/unpack MSB-first per the spec; gray sub-byte samples
  are returned raw (0..2**depth−1), not 8-bit-rescaled.
- **JPEG** (rounds 10-11): huffman DCT — baseline sequential (SOF0),
  extended sequential (SOF1) incl. 12-bit precision, and progressive
  (SOF2, spectral selection + successive approximation) — grayscale and
  YCbCr 4:4:4 / 4:2:0, stream-defined DQT/DHT tables (8- and 16-bit
  quant entries), DRI restart markers, byte-unstuffing, float IDCT;
  encoder with Annex K typical tables (quality-scaled) for round-trip
  tests, plus progressive and 12-bit emit modes. JPEG is LOSSY, so this
  codec is pytest-pinned with error bounds rather than driver-oracle'd.
  Arithmetic coding / hierarchical mode raise ``NotImplementedError``.
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
    """Container kind from magic bytes:
    'bmp'|'ppm'|'png'|'wav'|'avi'|'jpeg'|'gif'|None."""
    if len(buf) >= 2 and buf[:2] == b"BM":
        return "bmp"
    if len(buf) >= 2 and buf[:2] == b"P6":
        return "ppm"
    if len(buf) >= 8 and buf[:8] == _PNG_SIG:
        return "png"
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return "avi"
    if len(buf) >= 3 and buf[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(buf) >= 6 and buf[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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

# Decode-side allocation cap for the COMPRESSED containers (PNG, JPEG):
# their headers declare the output size independently of the input size,
# so a tiny crafted stream can claim 60000x60000 pixels and OOM the
# worker before any data check fires (the _inflate_bounded guard bounds
# output at `need`, but `need` itself is attacker-controlled). 64M
# pixels ≈ a 256 MB RGBA frame — far above any thumbnail/training-image
# payload, far below worker memory. BMP/PPM/WAV need no cap: their
# pixel bytes are stored 1:1, so the existing truncation checks bound
# allocations by the actual payload size.
MAX_DECODE_PIXELS = 1 << 26


def _check_decode_dims(w: int, h: int, kind: str) -> None:
    if w == 0 or h == 0:
        raise ValueError(f"invalid {kind} dimensions {w}x{h}")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"{kind} dimensions {w}x{h} exceed the {MAX_DECODE_PIXELS}-pixel "
            f"decode cap (decompression bomb?)"
        )


def _pack_subbyte_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) sample values (< 2**depth) → (h, ceil(w·depth/8)) packed
    scanline bytes, MSB-first within each byte per the PNG spec; the
    last byte of a row is zero-padded."""
    h, w = samples.shape
    per = 8 // depth
    pad = (-w) % per
    padded = np.pad(samples.astype(np.uint8), ((0, 0), (0, pad)))
    grouped = padded.reshape(h, -1, per)
    out = np.zeros(grouped.shape[:2], dtype=np.uint8)
    for i in range(per):
        out = (out << depth) | grouped[:, :, i]
    return out


def _unpack_subbyte_rows(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride) packed scanline bytes → (h, w) sample values,
    MSB-first within each byte per the PNG spec (row padding bits
    discarded)."""
    bits = np.unpackbits(np.ascontiguousarray(rows), axis=1)
    grouped = bits.reshape(rows.shape[0], -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (
        (grouped * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :w]
    )


def encode_png(
    pixels: np.ndarray, interlace: bool = False, depth: int | None = None
) -> bytes:
    """(h, w[, ch]) uint8/uint16 → PNG (dtype picks 8- vs 16-bit;
    16-bit samples are written big-endian per the spec). Channel count
    picks the color type: 1 → grayscale (0), 2 → gray+alpha (4),
    3 → truecolor (2), 4 → RGBA (6); a 2-D array is treated as
    grayscale. ``depth`` of 1/2/4 (round 11) packs a GRAYSCALE image
    sub-byte, MSB-first — sample values must be < 2**depth and are
    stored raw (no 8-bit rescale), matching the decoder. ``interlace=
    True`` emits the seven Adam7 passes. Every scanline uses filter 0
    (None): DEFLATE already removes most redundancy at these sizes and
    the decode of our own output stays a straight memcpy."""
    src = np.asarray(pixels)
    if src.dtype == np.uint16:
        bitdepth, wire = 16, ">u2"
    elif src.dtype == np.uint8:
        bitdepth, wire = 8, np.uint8
    else:
        raise ValueError(f"encode_png expects uint8 or uint16 pixels, got {src.dtype}")
    px = src
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _PNG_CTYPE_BY_CH:
        raise ValueError("encode_png expects (h, w, 1|2|3|4) pixels")
    h, w, ch = px.shape
    sub_byte = depth in (1, 2, 4)
    if depth is not None and not sub_byte:
        raise ValueError(f"depth must be 1, 2 or 4 when given, got {depth}")
    if sub_byte:
        if ch != 1 or src.dtype != np.uint8:
            raise ValueError("sub-byte encode_png requires (h, w[, 1]) uint8")
        if int(px.max(initial=0)) >= (1 << depth):
            raise ValueError(
                f"sample {int(px.max())} out of range for depth {depth}"
            )
        bitdepth = depth
    ctype = _PNG_CTYPE_BY_CH[ch]
    wire_px = np.ascontiguousarray(px.astype(wire))

    def scan_rows(plane: np.ndarray) -> bytes:
        # plane: (rows, cols, ch) in wire dtype → filter-0 scanlines
        if sub_byte:
            packed = _pack_subbyte_rows(plane[:, :, 0], depth)
            return b"".join(b"\x00" + packed[y].tobytes() for y in range(len(packed)))
        return b"".join(b"\x00" + plane[y].tobytes() for y in range(len(plane)))

    if not interlace:
        raw = scan_rows(wire_px)
    else:
        parts = []
        for x0, y0, dx, dy, _pw, _ph in _adam7_passes(w, h):
            parts.append(scan_rows(np.ascontiguousarray(wire_px[y0::dy, x0::dx])))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, ctype, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    idx: np.ndarray,
    palette: np.ndarray,
    trns: bytes | None = None,
    depth: int = 8,
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → color-type-3
    PNG (non-interlaced, filter-0 scanlines). ``depth`` of 1/2/4
    (round 11) packs indices sub-byte, MSB-first — the common web-crawl
    palette-PNG layout. ``trns`` appends a tRNS alpha chunk (entries
    past its length default to opaque 255 per the spec, which the
    decoder honors)."""
    ix = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if ix.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("encode_png_palette expects (h, w) indices and (n, 3) palette")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette depth must be 1, 2, 4 or 8, got {depth}")
    if int(ix.max(initial=0)) >= min(len(pal), 1 << depth):
        raise ValueError(
            f"palette index {int(ix.max())} out of range "
            f"({len(pal)} entries, depth {depth})"
        )
    h, w = ix.shape
    if depth == 8:
        raw = b"".join(b"\x00" + ix[y].tobytes() for y in range(h))
    else:
        packed = _pack_subbyte_rows(ix, depth)
        raw = b"".join(b"\x00" + packed[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
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
    """Gray (1/2/4/8/16-bit) / gray+alpha / truecolor / RGBA (8/16-bit)
    / palette (1/2/4/8-bit) PNG → (h, w, 1|2|3|4) uint8 (or uint16 for
    depth 16), both sequential and Adam7-interlaced. Chunk CRCs are
    verified (a cut-off or bit-rotted download fails loudly, like the
    other decoders); all five scanline filters reconstruct, operating at
    the byte level with the depth-scaled filter distance per the spec
    (distance 1 for sub-byte depths). Palette images decode through the
    PLTE lookup to RGB — RGBA when a tRNS alpha chunk is present.
    Sub-byte GRAY samples are returned raw (0..2**depth−1, no 8-bit
    rescale — lossless, matching encode_png). The IDAT inflate is
    bounded by the expected pixel-stream size, so a crafted
    decompression bomb raises instead of exhausting memory."""
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
    # spec-legal depth/ctype combinations this decoder covers: gray 0 →
    # 1/2/4/8/16; palette 3 → 1/2/4/8; truecolor/alpha 2/4/6 → 8/16
    depth_ok = (
        depth in (1, 2, 4, 8, 16)
        if ctype == 0
        else depth in (1, 2, 4, 8)
        if paletted
        else depth in (8, 16) and ctype in _PNG_CH_BY_CTYPE
    )
    if not depth_ok:
        raise NotImplementedError(
            f"unsupported PNG depth/color-type combination "
            f"(depth={depth}, color type={ctype})"
        )
    _check_decode_dims(w, h, "PNG")
    # palette scanlines carry one index per pixel; the filters operate
    # on the packed bytes (bpp=1 for sub-byte rows), lookup happens after
    ch = 1 if paletted else _PNG_CH_BY_CTYPE[ctype]
    sub_byte = depth in (1, 2, 4)
    bpp = 1 if sub_byte else ch * (depth // 8)  # filter distance, bytes

    def row_bytes(width: int) -> int:
        return (width * depth + 7) // 8 if sub_byte else width * bpp

    if interlace == 0:
        stride = row_bytes(w)
        need = h * (1 + stride)
        raw = _inflate_bounded(idat, need)
        if len(raw) != need:
            raise ValueError(f"PNG pixel stream {len(raw)} bytes, expected {need}")
        rows = _png_unfilter(raw, h, stride, bpp)
        flat = (
            _unpack_subbyte_rows(rows, w, depth) if sub_byte else rows
        )
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        passes = list(_adam7_passes(w, h))
        need = sum(ph * (1 + row_bytes(pw)) for *_xy, pw, ph in passes)
        raw = _inflate_bounded(idat, need)
        if len(raw) != need:
            raise ValueError(f"PNG pixel stream {len(raw)} bytes, expected {need}")
        full = np.zeros((h, w, 1 if sub_byte else bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in passes:
            sub = _png_unfilter(raw, ph, row_bytes(pw), bpp, pos=off)
            off += ph * (1 + row_bytes(pw))
            if sub_byte:
                full[y0::dy, x0::dx] = _unpack_subbyte_rows(sub, pw, depth)[
                    :, :, None
                ]
            else:
                full[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        flat = full.reshape(h, w) if sub_byte else full.reshape(h, w * bpp)
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

    ``kind`` ('bmp'|'ppm'|'png'|'jpeg'|'gif'|'wav'),
    ``width``/``height``/``channels``,
    ``sample_rate`` (0 for images), ``n_samples`` (decoded scalar count:
    h*w*channels for images, frames*channels for audio), ``content_sum`` (exact
    integer sum of the DECODED scalars — container headers and BMP row
    padding excluded, which is what distinguishes a real decode from a
    raw byte pass), and ``content`` (the decoded ndarray).

    Unknown containers raise ``NotImplementedError`` — the advertised
    guard for codecs this environment cannot host.
    """
    kind = sniff(bytes(buf))
    if kind in ("gif", "avi"):
        if kind == "gif":
            frames, _delays = decode_gif(bytes(buf))
        else:
            frames, _fps = decode_avi(bytes(buf))
        stack = np.stack(frames)  # (n_frames, H, W, ch)
        return {
            "kind": kind,
            "width": stack.shape[2],
            "height": stack.shape[1],
            "channels": stack.shape[3],
            "sample_rate": 0,
            "n_samples": int(stack.size),  # frames × H × W × 3
            "content_sum": int(stack.sum(dtype=np.int64)),
            "content": stack,
        }
    if kind in ("bmp", "ppm", "png", "jpeg"):
        px = {"bmp": decode_bmp, "ppm": decode_ppm, "png": decode_png,
              "jpeg": decode_jpeg}[kind](bytes(buf))
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
        f"BMP/PPM/PNG/JPEG/GIF/WAV decode in this environment; other "
        f"codecs need libraries not installed here"
    )


# ----------------------------------------------------------------- JPEG
# Huffman DCT JPEG, pure numpy + stdlib: baseline sequential SOF0
# (round 10), extended sequential SOF1 incl. 12-bit precision and
# PROGRESSIVE SOF2 with successive approximation (round 11). Grayscale
# and YCbCr 4:4:4 / 4:2:0; the constants below (zigzag order,
# quantization and Huffman table specs) are the JPEG standard's Annex K
# reference tables (the 12-bit encoder adds full-range tables — Annex K
# stops at 8-bit categories). Arithmetic coding, hierarchical mode and
# fancier subsampling raise NotImplementedError. JPEG is LOSSY:
# decode(encode(x)) approximates x (tests bound the error), so unlike
# BMP/PNG/WAV this codec is pytest-pinned, not driver-oracle'd.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits-per-length[1..16], symbol values) — Annex K typical tables
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# Full-range tables for the 12-BIT encoder (round 11): Annex K stops at
# 8-bit-sized categories, but 12-bit DC diffs reach category 15 and AC
# magnitudes category 14. Flat canonical codes — DC: 16 categories at 5
# bits; AC: EOB, ZRL and every (run 0-15, size 1-15) symbol at 8 bits
# (242 codes < 256, prefix-free by construction). Not optimal, just
# valid — our 12-bit streams exist for decoder round-trip tests.
_HUFF_DC_FULL = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
_HUFF_AC_FULL = (
    [0] * 7 + [242] + [0] * 8,
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 16)],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: dct2(b) = A @ b @ A.T."""
    x = np.arange(8)
    A = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    A[0] /= np.sqrt(2)
    return A


_DCT8 = _dct_matrix()


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality must be 1..100, got {quality}")
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    ql = np.clip(np.floor((_Q_LUMA * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_Q_CHROMA * scale + 50) / 100), 1, 255)
    return ql, qc


def _huff_encode_table(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via canonical code assignment."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    if sum(bits) > len(vals):
        raise ValueError(
            f"malformed JPEG DHT: bit counts claim {sum(bits)} symbols, "
            f"{len(vals)} present"
        )
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per the spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, blk, dc_tab, ac_tab, pred):
    """Quantized zigzag coefficients -> DC diff + AC RLE huffman bits.
    Returns the new DC predictor."""
    zz = blk.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            if i > last_nz:
                break
            run += 1
            if run == 16:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (H//8, W//8, 8, 8)."""
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad a (H, W) plane to multiples of (mh, mw)."""
    H, W = img.shape
    ph = (-H) % mh
    pw = (-W) % mw
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: str = "444",
    restart_interval: int = 0, progressive: bool = False,
    precision: int = 8,
) -> bytes:
    """(h, w) / (h, w, 1) uint8 grayscale or (h, w, 3) uint8 RGB →
    baseline sequential JFIF JPEG with the Annex K typical quantization
    (quality-scaled) and Huffman tables. ``subsample`` for color input:
    '444' (no chroma subsampling) or '420' (2x2-mean chroma, 16x16
    MCUs). ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that many MCUs (DC predictors reset — what real encoders emit
    for error resilience). ``progressive=True`` (round 11) emits a SOF2
    stream with spectral selection AND successive approximation (DC at
    Al=1 + refinement; per-component AC bands 1-5 / 6-63 at Al=1 +
    refinements) — the SAME quantized coefficients as the baseline
    stream, so both decode bit-identically; EOB runs are always length 1
    (valid, and representable in the Annex K tables, which lack EOBn
    symbols). Lossy by nature — see decode_jpeg for the error bounds
    the tests pin."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    if precision == 12:
        if progressive:
            raise ValueError("progressive 12-bit encode unsupported "
                             "(decode handles SOF2 at 12-bit)")
        px = np.asarray(pixels)
        if px.dtype != np.uint16:
            raise ValueError("12-bit encode_jpeg expects uint16 pixels")
        if int(px.max(initial=0)) > 4095:
            raise ValueError("12-bit encode_jpeg samples must be <= 4095")
    else:
        px = np.asarray(pixels, dtype=np.uint8)
    center = float(1 << (precision - 1))
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w[, 1]) gray or (h, w, 3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    ql, qc = _quant_tables(quality)

    if gray:
        planes = [px.astype(np.float64) - center]
        qts = [ql]
        samp = [(1, 1)]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        if subsample == "420":
            # 2x2 mean over an edge-padded even grid
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - center, cb - center, cr - center]
        qts = [ql, qc, qc]

    # per-component quantized DCT blocks. Each component plane (already
    # at its own resolution) pads to a multiple of 8*its own sampling
    # factor, which makes every plane exactly mcu_rows*8*sv tall (the
    # ceil identities line up because the chroma planes were built with
    # ceil-half dimensions).
    comp_blocks = []
    for plane, qt, (sh, sv) in zip(planes, qts, samp):
        p = _pad_to(plane, 8 * sv, 8 * sh)
        blk = _blocks_of(p)
        coef = np.einsum("ij,abjk,lk->abil", _DCT8, blk, _DCT8)
        q = np.round(coef / qt).astype(np.int64)
        if precision == 12:
            # keep AC categories <= 14 and DC-diff categories <= 15, the
            # ranges the full tables (and the 12-bit spec) cover; the
            # clamp only binds at quality ~100 on extreme blocks
            q = np.clip(q, -16383, 16383)
        comp_blocks.append(q)

    if precision == 12:
        dc_f = _huff_encode_table(_HUFF_DC_FULL)
        ac_f = _huff_encode_table(_HUFF_AC_FULL)
        tabs = [(dc_f, ac_f)] * len(planes)
    else:
        dc_l = _huff_encode_table(_HUFF_DC_LUMA)
        ac_l = _huff_encode_table(_HUFF_AC_LUMA)
        dc_c = _huff_encode_table(_HUFF_DC_CHROMA)
        ac_c = _huff_encode_table(_HUFF_AC_CHROMA)
        tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    if progressive:
        if restart_interval:
            raise ValueError(
                "restart_interval is unsupported with progressive=True"
            )
        return _encode_jpeg_progressive(
            h, w, gray, samp, comp_blocks, ql, qc, tabs
        )

    # interleaved MCU scan
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_rows = comp_blocks[0].shape[0] // samp[0][1]
    mcu_cols = comp_blocks[0].shape[1] // samp[0][0]
    mcu_idx = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                if bw.nbits:  # byte-align with 1-padding, then the marker
                    bw.write((1 << (8 - bw.nbits)) - 1, 8 - bw.nbits)
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            mcu_idx += 1
            for ci, (blocks, (sh, sv)) in enumerate(zip(comp_blocks, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        preds[ci] = _encode_block(
                            bw, blocks[my * sv + by, mx * sh + bx],
                            tabs[ci][0], tabs[ci][1], preds[ci],
                        )
    data = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + ql.astype(np.uint8).reshape(64)[_ZIGZAG].tobytes())
    if not gray:
        out += _seg(0xDB, b"\x01" + qc.astype(np.uint8).reshape(64)[_ZIGZAG].tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    # 12-bit requires extended sequential (SOF1); baseline SOF0 is 8-bit
    out += _seg(0xC1 if precision == 12 else 0xC0, sof)
    if precision == 12:
        dht_specs = ((0, 0, _HUFF_DC_FULL), (1, 0, _HUFF_AC_FULL),
                     (0, 1, _HUFF_DC_FULL), (1, 1, _HUFF_AC_FULL))
    else:
        dht_specs = ((0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA),
                     (0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA))
    for cls, tid, spec in dht_specs:
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)



def _emit_ac_first(bw, zzvec, ss, se, al, ac_tab) -> None:
    """One block of a first-pass AC scan (Ah=0): band [ss, se], point
    transform = magnitude >> al (round toward zero), runs + categories
    like the sequential scan, plain EOB (run length 1) when the band
    has trailing zeros."""
    tvals = []
    for k in range(ss, se + 1):
        c = int(zzvec[k])
        t = abs(c) >> al
        tvals.append(t if c >= 0 else -t)
    last = -1
    for i, t in enumerate(tvals):
        if t:
            last = i
    if last < 0:
        code, ln = ac_tab[0x00]
        bw.write(code, ln)
        return
    r = 0
    for i in range(last + 1):
        t = tvals[i]
        if t == 0:
            r += 1
            if r == 16:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                r = 0
            continue
        s = _category(t)
        code, ln = ac_tab[(r << 4) | s]
        bw.write(code, ln)
        bw.write(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if last < se - ss:
        code, ln = ac_tab[0x00]
        bw.write(code, ln)


def _emit_ac_refine(bw, zzvec, ss, se, al, ac_tab) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-significant
    coefficients (magnitude>>al == 1) code as (run<<4)|1 + sign bit;
    already-significant coefficients passed over buffer one correction
    bit each, flushed after the next symbol (the spec's G.1.2.3
    procedure, EOB-run length fixed at 1)."""
    tvals = [abs(int(zzvec[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, t in enumerate(tvals):
        if t == 1:
            eob = i
    r = 0
    br_bits: list[int] = []

    def flush_bits() -> None:
        for b in br_bits:
            bw.write(b, 1)
        br_bits.clear()

    for i, t in enumerate(tvals):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            code, ln = ac_tab[0xF0]  # ZRL over 16 zero-history positions
            bw.write(code, ln)
            r -= 16
            flush_bits()
        if t > 1:  # already significant: one correction bit
            br_bits.append(t & 1)
            continue
        # newly significant (t == 1)
        code, ln = ac_tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zzvec[ss + i]) >= 0 else 0, 1)
        flush_bits()
        r = 0
    if r > 0 or br_bits:
        code, ln = ac_tab[0x00]  # EOB (run of exactly 1)
        bw.write(code, ln)
        flush_bits()


def _encode_jpeg_progressive(
    h, w, gray, samp, comp_blocks, ql, qc, tabs
) -> bytes:
    """SOF2 assembly for encode_jpeg(progressive=True): DC scan (all
    components, Al=1) + DC refinement, then per component AC 1-5 and
    6-63 at Al=1 with their refinements — the full successive-
    approximation machinery, restricted to EOB runs of 1 so the Annex K
    tables suffice."""
    ncomp = 1 if gray else 3
    maxh = max(sh for sh, _ in samp)
    maxv = max(sv for _, sv in samp)
    # zigzag coefficient grids per component
    zzg = [
        blocks.reshape(blocks.shape[0], blocks.shape[1], 64)[:, :, _ZIGZAG]
        for blocks in comp_blocks
    ]
    mcu_rows = comp_blocks[0].shape[0] // samp[0][1]
    mcu_cols = comp_blocks[0].shape[1] // samp[0][0]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + ql.astype(np.uint8).reshape(64)[_ZIGZAG].tobytes())
    if not gray:
        out += _seg(0xDB, b"\x01" + qc.astype(np.uint8).reshape(64)[_ZIGZAG].tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    for cls, tid, spec in ((0, 0, _HUFF_DC_LUMA), (1, 0, _HUFF_AC_LUMA),
                           (0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)):
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]))

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scan_comps)])
        for ci in scan_comps:
            tid = 0 if ci == 0 else 1
            body += bytes([ci + 1, (tid << 4) | tid])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # ---- scan 1: DC, all components, Al=1 (interleaved MCU order)
    out += sos(list(range(ncomp)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                dc_tab = tabs[ci][0]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(zzg[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        code, ln = dc_tab[s]
                        bw.write(code, ln)
                        if s:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
    out += bw.flush()

    # ---- scan 2: DC refinement (Ah=1, Al=0): one raw bit per block
    out += sos(list(range(ncomp)), 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bw.write(
                            int(zzg[ci][my * sv + by, mx * sh + bx, 0]) & 1, 1
                        )
    out += bw.flush()

    # ---- per-component AC scans over the NON-INTERLEAVED grid
    for ci in range(ncomp):
        sh, sv = samp[ci]
        bcols = -(-(w * sh) // (8 * maxh))
        brows = -(-(h * sv) // (8 * maxv))
        ac_tab = tabs[ci][1]
        for ss_b, se_b, ah, al in ((1, 5, 0, 1), (6, 63, 0, 1),
                                   (1, 5, 1, 0), (6, 63, 1, 0)):
            out += sos([ci], ss_b, se_b, ah, al)
            bw = _BitWriter()
            for by in range(brows):
                for bx in range(bcols):
                    if ah == 0:
                        _emit_ac_first(bw, zzg[ci][by, bx], ss_b, se_b, al,
                                       ac_tab)
                    else:
                        _emit_ac_refine(bw, zzg[ci][by, bx], ss_b, se_b, al,
                                        ac_tab)
            out += bw.flush()

    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker. ``restart()`` byte-aligns
    and consumes an RSTn marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.done = False

    def _fill(self) -> None:
        if self.done or self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy-coded segment")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: the scan is malformed
                raise ValueError("unexpected JPEG restart marker inside a block")
            else:
                self.done = True
                raise ValueError("truncated JPEG entropy-coded segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def restart(self) -> None:
        """Byte-align and consume the next RSTn marker."""
        self.acc = 0
        self.nbits = 0
        # an all-ones pad byte becomes a stuffed FF00 — skip it
        if (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and self.buf[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("missing JPEG restart marker at restart interval")

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _skip_jpeg_entropy(buf: bytes, pos: int) -> int:
    """Advance past an entropy-coded segment: stuffed 0xFF00 bytes and
    RSTn markers belong to the segment; 0xFF fill bytes before a marker
    are skipped; the returned position is ON the 0xFF of the next real
    marker (or EOF)."""
    n = len(buf)
    while pos + 1 < n:
        if buf[pos] == 0xFF:
            nxt = buf[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _mjpeg_default_table(tc: int, th: int):
    """Annex K typical tables for MJPEG frames that OMIT their DHT
    segments (the OpenDML convention: AVI MJPG frames may rely on the
    standard tables). Only consulted when decode_jpeg runs with
    default_tables=True — standalone JPEG decoding keeps the loud
    missing-table error."""
    spec = {
        (0, 0): _HUFF_DC_LUMA, (1, 0): _HUFF_AC_LUMA,
        (0, 1): _HUFF_DC_CHROMA, (1, 1): _HUFF_AC_CHROMA,
    }.get((tc, th))
    return None if spec is None else _huff_decode_table(list(spec[0]),
                                                        list(spec[1]))


def decode_jpeg(buf: bytes, default_tables: bool = False) -> np.ndarray:
    """Huffman DCT JPEG — baseline sequential (SOF0), extended
    sequential (SOF1) and PROGRESSIVE (SOF2, round 11: spectral
    selection + successive approximation, DC/AC refinement scans, EOB
    runs, non-interleaved scan geometry) → (h, w, 1) grayscale or
    (h, w, 3) RGB uint8. Parses DQT/DHT tables from the stream (any
    conforming tables, not just the Annex K typical ones; progressive
    scans snapshot tables at each SOS since they may be redefined
    between scans), honors DRI restart intervals, handles interleaved
    multi-component scans with per-component sampling factors (4:4:4
    and 4:2:0 are the tested layouts; any h×v ≤ 2×2 grid decodes),
    nearest-neighbor chroma upsample, float IDCT. Arithmetic coding
    (SOF9+), 12-bit precision and hierarchical modes raise
    NotImplementedError; structural corruption raises ValueError."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    sof = None
    dri = 0
    scan = None
    progressive = False
    scans: list[tuple] = []  # progressive scan snapshots
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at byte {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", buf, pos + 2)[0]
        body = buf[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError(f"truncated JPEG segment {marker:#x}")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"invalid JPEG quant-table precision {pq}")
                tbl = np.empty(64, dtype=np.float64)
                if pq == 0:  # 8-bit entries
                    tbl[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, off + 1)
                    off += 65
                else:  # 16-bit big-endian entries (12-bit streams)
                    tbl[_ZIGZAG] = np.frombuffer(body, ">u2", 64, off + 1)
                    off += 129
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential (identical wire
            # decode) / SOF2 progressive (round 11)
            if len(body) < 6:
                raise ValueError(f"malformed JPEG SOF segment ({len(body)} bytes)")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError(
                    f"malformed JPEG SOF segment ({len(body)} bytes for "
                    f"{nc} components)"
                )
            if prec not in (8, 12) or (prec == 12 and marker == 0xC0):
                # baseline (SOF0) is 8-bit by definition; SOF1/SOF2
                # also carry 12-bit (round 11)
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(nc):  # component specs follow the 6-byte header
                cid, hv, tqi = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tqi))
            sof = (h, w, comps, prec)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline/extended-sequential/progressive huffman "
                f"JPEG supported, got SOF marker {marker:#x}"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("malformed JPEG DRI segment")
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if not body:
                raise ValueError("malformed JPEG SOS segment (empty)")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError(
                    f"malformed JPEG SOS segment ({len(body)} bytes for "
                    f"{ns} components)"
                )
            sel = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tabs >> 4, tabs & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            data_pos = pos + 2 + ln
            if not progressive:
                scan = (sel, data_pos)
                break
            # progressive: snapshot the scan (tables/DRI may be redefined
            # between scans), skip its entropy bytes, keep parsing
            scans.append(
                (sel, ss, se, ah_al >> 4, ah_al & 0x0F, dict(huff), dri,
                 data_pos)
            )
            pos = _skip_jpeg_entropy(buf, data_pos)
            continue
        pos += 2 + ln
    if sof is None or (scan is None and not scans):
        raise ValueError("JPEG stream missing SOF/SOS segment")
    if progressive:
        return _decode_jpeg_progressive(bytes(buf), sof, qt, scans)
    h, w, comps, prec = sof
    center = float(1 << (prec - 1))
    _check_decode_dims(w, h, "JPEG")
    sel, data_pos = scan
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    if maxh > 2 or maxv > 2:
        raise NotImplementedError("JPEG sampling factors above 2 unsupported")
    mcu_cols = -(-w // (8 * maxh))
    mcu_rows = -(-h // (8 * maxv))
    # per-component block grids
    planes = {}
    meta = {}
    for cid, sh, sv, tqi in comps:
        planes[cid] = np.zeros((mcu_rows * sv * 8, mcu_cols * sh * 8))
        meta[cid] = (sh, sv, tqi)
    order = []  # (cid, dc_table, ac_table) in scan order
    for cs, td, ta in sel:
        if cs not in meta:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        dct = huff.get((0, td))
        act = huff.get((1, ta))
        if default_tables:  # MJPEG frames may omit DHT (see helper)
            dct = dct or _mjpeg_default_table(0, td)
            act = act or _mjpeg_default_table(1, ta)
        if dct is None or act is None:
            raise ValueError("JPEG scan references a missing huffman table")
        order.append((cs, dct, act))

    br = _BitReader(bytes(buf), data_pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_done = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if dri and mcu_done and mcu_done % dri == 0:
                br.restart()
                preds = {cid: 0 for cid, *_ in comps}
            for cid, dct, act in order:
                sh, sv, tqi = meta[cid]
                if tqi not in qt:
                    raise ValueError(f"JPEG component uses missing quant table {tqi}")
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64)
                        s = br.huff(dct)
                        if s > 15:  # crafted-table guard (see the
                            # progressive DC path; fuzz find)
                            raise ValueError(f"invalid JPEG DC category {s}")
                        preds[cid] += br.extend(s)
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = br.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC coefficient overrun")
                            zz[k] = br.extend(s)
                            k += 1
                        blk = np.empty(64)
                        blk[_ZIGZAG] = zz
                        coef = blk.reshape(8, 8) * qt[tqi]
                        px8 = _DCT8.T @ coef @ _DCT8 + center
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px8
            mcu_done += 1

    return _compose_jpeg_planes(planes, comps, maxh, maxv, h, w, prec)


def _compose_jpeg_planes(planes, comps, maxh, maxv, h, w, prec=8) -> np.ndarray:
    """Per-component float planes → upsampled/cropped image (grayscale
    or YCbCr→RGB), shared by the sequential and progressive paths.
    8-bit → uint8 clipped 0..255; 12-bit → uint16 clipped 0..4095 with
    the chroma center at 2048."""
    center = float(1 << (prec - 1))
    vmax = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    out_planes = []
    for cid, sh, sv, _tqi in comps:
        p = planes[cid]
        # nearest-neighbor upsample to full resolution, then crop
        if sh < maxh or sv < maxv:
            p = np.repeat(np.repeat(p, maxv // sv, axis=0), maxh // sh, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, vmax).astype(dtype)
        return y[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(
            f"{len(out_planes)}-component JPEG unsupported (expected 1 or 3)"
        )
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, vmax).astype(dtype)


def _decode_jpeg_progressive(buf: bytes, sof, qt, scans) -> np.ndarray:
    """Progressive JPEG (SOF2) scan replay: every scan updates the
    per-component DCT coefficient grids (zigzag order, successive-
    approximation bit planes applied as they arrive — DC first/refine,
    AC first with EOB runs, AC refinement with correction bits per the
    spec's G.1.2 procedures); one dequantize + IDCT at the end. Scan
    geometry: interleaved scans walk MCUs, single-component scans walk
    the component's own ceil(dim/8) block grid (which is SMALLER than
    the MCU-padded grid for subsampled components)."""
    h, w, comps, prec = sof
    _check_decode_dims(w, h, "JPEG")
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    if maxh > 2 or maxv > 2:
        raise NotImplementedError("JPEG sampling factors above 2 unsupported")
    mcu_cols = -(-w // (8 * maxh))
    mcu_rows = -(-h // (8 * maxv))
    meta = {}
    zz: dict[int, np.ndarray] = {}  # cid -> (brows, bcols, 64) zigzag coefs
    for cid, sh, sv, tqi in comps:
        meta[cid] = (sh, sv, tqi)
        zz[cid] = np.zeros((mcu_rows * sv, mcu_cols * sh, 64), dtype=np.int64)

    for sel, ss, se, ah, al, huff, dri, data_pos in scans:
        if not (0 <= ss <= se <= 63) or al > 13:
            raise ValueError(f"invalid JPEG scan band Ss={ss} Se={se} Al={al}")
        dc_scan = ss == 0
        if dc_scan and se != 0:
            raise ValueError("progressive JPEG DC scan must have Se=0")
        if not dc_scan and len(sel) != 1:
            raise ValueError("progressive JPEG AC scans must be single-component")
        for cs, _td, _ta in sel:
            if cs not in meta:
                raise ValueError(f"JPEG scan references unknown component {cs}")
        br = _BitReader(buf, data_pos)
        preds = {cs: 0 for cs, *_ in sel}
        eob_run = 0

        def dc_block(cz: np.ndarray, cs: int, dct: dict) -> None:
            nonlocal preds
            if ah == 0:  # first pass: DPCM of (DC >> Al)
                s = br.huff(dct)
                if s > 15:  # a crafted table can code any 0-255 symbol;
                    # a huge category would read s garbage bits and
                    # overflow the coefficient store (fuzz find)
                    raise ValueError(f"invalid JPEG DC category {s}")
                preds[cs] += br.extend(s)
                cz[0] = preds[cs] << al
            else:  # refinement: one raw bit
                if br.bits(1):
                    cz[0] |= 1 << al
        p1 = 1 << al
        m1 = -(1 << al)

        def ac_block_first(cz: np.ndarray, act: dict) -> None:
            nonlocal eob_run
            if eob_run > 0:
                eob_run -= 1
                return
            k = ss
            while k <= se:
                rs = br.huff(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:  # EOBn: run of 2^r + bits(r) blocks
                        eob_run = (1 << r) - 1
                        if r:
                            eob_run += br.bits(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("JPEG AC coefficient overrun")
                cz[k] = br.extend(s) << al
                k += 1

        def ac_block_refine(cz: np.ndarray, act: dict) -> None:
            # spec G.1.2.3 (the libjpeg-documented procedure): newly-
            # significant coefficients arrive as ±1<<Al; every nonzero
            # coefficient passed over contributes one correction bit
            nonlocal eob_run
            k = ss
            if eob_run == 0:
                while k <= se:
                    rs = br.huff(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eob_run = 1 << r
                            if r:
                                eob_run += br.bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid JPEG AC refinement magnitude"
                            )
                        val = p1 if br.bits(1) else m1
                    while k <= se:
                        if cz[k] != 0:
                            if br.bits(1) and (cz[k] & p1) == 0:
                                cz[k] += p1 if cz[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        cz[k] = val
                    k += 1
            if eob_run > 0:
                while k <= se:
                    if cz[k] != 0:
                        if br.bits(1) and (cz[k] & p1) == 0:
                            cz[k] += p1 if cz[k] >= 0 else m1
                    k += 1
                eob_run -= 1

        def do_unit(cz: np.ndarray, cs: int, dct, act) -> None:
            if dc_scan:
                dc_block(cz, cs, dct)
            elif ah == 0:
                ac_block_first(cz, act)
            else:
                ac_block_refine(cz, act)

        def restart_if_due(done: int) -> None:
            nonlocal preds, eob_run
            if dri and done and done % dri == 0:
                br.restart()
                preds = {cs: 0 for cs, *_ in sel}
                eob_run = 0

        tables = {}
        for cs, td, ta in sel:
            dct = huff.get((0, td)) if dc_scan and ah == 0 else None
            act = huff.get((1, ta)) if not dc_scan else None
            if dc_scan and ah == 0 and dct is None:
                raise ValueError("JPEG scan references a missing huffman table")
            if not dc_scan and act is None:
                raise ValueError("JPEG scan references a missing huffman table")
            tables[cs] = (dct, act)

        if len(sel) > 1:  # interleaved (DC scans only, per the checks above)
            done = 0
            for my in range(mcu_rows):
                for mx in range(mcu_cols):
                    restart_if_due(done)
                    for cs, _td, _ta in sel:
                        sh, sv, _tqi = meta[cs]
                        dct, act = tables[cs]
                        for by in range(sv):
                            for bx in range(sh):
                                do_unit(
                                    zz[cs][my * sv + by, mx * sh + bx],
                                    cs, dct, act,
                                )
                    done += 1
        else:  # non-interleaved: the component's own ceil(dim/8) grid
            cs = sel[0][0]
            sh, sv, _tqi = meta[cs]
            # ceil(ceil(dim·samp/maxsamp)/8) == ceil(dim·samp/(8·maxsamp))
            bcols = -(-(w * sh) // (8 * maxh))
            brows = -(-(h * sv) // (8 * maxv))
            dct, act = tables[cs]
            done = 0
            for by in range(brows):
                for bx in range(bcols):
                    restart_if_due(done)
                    do_unit(zz[cs][by, bx], cs, dct, act)
                    done += 1

    # one dequantize + IDCT per component at the end
    planes = {}
    for cid, sh, sv, tqi in comps:
        if tqi not in qt:
            raise ValueError(f"JPEG component uses missing quant table {tqi}")
        grid = zz[cid]
        brows, bcols, _ = grid.shape
        nat = np.zeros((brows, bcols, 64))
        nat[:, :, _ZIGZAG] = grid
        coef = nat.reshape(brows, bcols, 8, 8) * qt[tqi]
        px8 = (
            np.einsum("ji,abjk,kl->abil", _DCT8, coef, _DCT8)
            + float(1 << (prec - 1))
        )
        planes[cid] = (
            px8.transpose(0, 2, 1, 3).reshape(brows * 8, bcols * 8)
        )
    return _compose_jpeg_planes(planes, comps, maxh, maxv, h, w, prec)


# ------------------------------------------------------------------ GIF
# GIF87a/89a (round 10): palette-indexed, LZW-compressed, LOSSLESS —
# and the one stdlib-decodable container with real MULTI-FRAME
# animation, which upgrades frame sampling from a byte-chunk stand-in
# to genuine frame extraction. Pure Python LZW (variable 3..12-bit
# codes, clear/end codes, 4096-entry dictionary) + numpy composition.


def _lzw_decode_gif(data: bytes, min_code: int, expected: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes."""
    if not 2 <= min_code <= 8:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + width <= total:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = dict(base)
            next_code = end + 1
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("corrupt GIF LZW stream (bad first code)")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW stream produced {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


def _lzw_encode_gif(indices: bytes, min_code: int) -> bytes:
    """Mirror of _lzw_decode_gif — emits clear up front, resets the
    dictionary at 4096 entries, ends with the end-of-information code."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # one emit LATER than the table-size parity suggests: the
            # decoder's table trails the encoder's by one entry (it adds
            # nothing for the first code after clear), so it widens one
            # code-stream position later — calibrated by round-trip test
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # dictionary full: clear and restart (keeps decoder in sync)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames, palette, delays_cs=None, transparent: int | None = None
) -> bytes:
    """Palette-indexed frames → GIF (GIF89a when animated/transparent,
    GIF87a for a single opaque frame). ``frames`` is a list of (h, w)
    uint8 index arrays (all the same size), ``palette`` an (n≤256, 3)
    uint8 RGB table; ``delays_cs`` per-frame delays in centiseconds
    (defaults to 10); ``transparent`` marks one palette index as
    transparent via a Graphic Control Extension. Pixels are LZW-encoded
    losslessly — the decoded frames reproduce ``palette[frames[i]]``
    exactly, which is what lets the driver oracle recompute GIF sums in
    closed form."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    pal = np.asarray(palette, dtype=np.uint8)
    if not frames or any(f.ndim != 2 for f in frames):
        raise ValueError("encode_gif expects a list of (h, w) uint8 index frames")
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("encode_gif expects an (n<=256, 3) uint8 palette")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all GIF frames must share one size")
    if any(int(f.max(initial=0)) >= len(pal) for f in frames):
        raise ValueError("GIF frame index out of palette range")
    # GCT size: power of two >= len(pal), minimum 2
    bits = max(1, (max(len(pal), 2) - 1).bit_length())
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[: len(pal)] = pal
    animated = len(frames) > 1 or transparent is not None
    out = bytearray(b"GIF89a" if animated else b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg 0, aspect 0
    out += gct.tobytes()
    delays = delays_cs or [10] * len(frames)
    if len(delays) != len(frames):
        # zip() would silently DROP trailing frames (ADVICE r10)
        raise ValueError(
            f"delays_cs has {len(delays)} entries for {len(frames)} frames"
        )
    min_code = max(2, bits)
    for f, delay in zip(frames, delays):
        if animated:
            packed = 0x01 if transparent is not None else 0x00
            out += bytes([0x21, 0xF9, 4, packed])
            out += struct.pack("<H", int(delay))
            out += bytes([transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        out += _gif_subblocks(_lzw_encode_gif(f.tobytes(), min_code))
    out += b"\x3b"
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(buf: bytes):
    """GIF87a/89a → (frames, delays_cs): every frame composed onto the
    logical-screen canvas as (H, W, 3) uint8 RGB. Global and local color
    tables, interlacing, transparency (transparent pixels leave the
    canvas unchanged), disposal methods 0/1 (keep) and 2 (restore to
    background color); disposal 3 (restore-previous) raises
    NotImplementedError. The pixel path is lossless LZW, so decoded
    frames equal the encoded palette lookups exactly."""
    if len(buf) < 13 or buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    w, h = struct.unpack_from("<HH", buf, 6)
    _check_decode_dims(w, h, "GIF")
    packed, bg, _aspect = buf[10], buf[11], buf[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("truncated GIF extension")
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                if pos >= len(buf):
                    raise ValueError("truncated GIF extension")
                size = buf[pos]
                gce = buf[pos + 1 : pos + 1 + size]
                pos += 1 + size
                if size < 4 or len(gce) < 4 or pos >= len(buf):
                    raise ValueError("malformed GIF graphic control extension")
                disposal = (gce[0] >> 2) & 0x07
                delay = struct.unpack_from("<H", gce, 1)[0]
                transparent = gce[3] if gce[0] & 0x01 else None
                if buf[pos] != 0:
                    raise ValueError("malformed GIF graphic control extension")
                pos += 1
            else:  # comment / application / plain text: skip sub-blocks
                while True:
                    if pos >= len(buf):
                        raise ValueError("truncated GIF extension sub-blocks")
                    n = buf[pos]
                    pos += 1
                    if n == 0:
                        break
                    pos += n
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block {b0:#04x}")
        # image descriptor
        if pos + 9 > len(buf):
            raise ValueError("truncated GIF image descriptor")
        left, top, iw, ih = struct.unpack_from("<HHHH", buf, pos)
        ipacked = buf[pos + 8]
        pos += 9
        _check_decode_dims(max(iw, 1), max(ih, 1), "GIF")
        if left + iw > w or top + ih > h:
            raise ValueError("GIF frame extends past the logical screen")
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(buf):
            raise ValueError("truncated GIF image data")
        min_code = buf[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(buf):
                raise ValueError("truncated GIF image data")
            n = buf[pos]
            pos += 1
            if n == 0:
                break
            data += buf[pos : pos + n]
            pos += n
        idx = np.frombuffer(
            _lzw_decode_gif(bytes(data), min_code, iw * ih), np.uint8
        ).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in the 4-pass order
            de = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, ih, step)
                de[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = de
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("GIF pixel index out of color-table range")
        if disposal == 3:
            raise NotImplementedError(
                "GIF disposal method 3 (restore previous) unsupported"
            )
        region = canvas[top : top + ih, left : left + iw]
        px = lct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = px[mask]
        else:
            region[:] = px
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore background before the next frame
            # the background color index refers to the GLOBAL color
            # table (ADVICE r10) — a frame's local table must not be
            # used for the restore, matching the initial canvas fill
            bg_rgb = gct[bg] if gct is not None and bg < len(gct) else 0
            canvas[top : top + ih, left : left + iw] = bg_rgb
        disposal = 0
        transparent = None
        delay = 0
    if not frames:
        raise ValueError("GIF stream contains no image frames")
    return frames, delays


# ------------------------------------------------------------------ AVI
# RIFF AVI container with MJPEG (Motion-JPEG) video frames (round 11) —
# the one video container expressible with this module's own JPEG
# codec: each '00dc' chunk in the 'movi' list is a standalone JPEG
# stream. Parsing follows the public RIFF/AVI layout (hdrl: avih main
# header + per-stream strl/strh/strf; movi: frame chunks, possibly
# inside 'rec ' sublists; word-aligned chunks). Frames may omit their
# huffman tables per the OpenDML MJPEG convention — decode falls back
# to the Annex K tables for AVI frames only. Non-MJPG video codecs
# raise NotImplementedError (no codec libraries in this environment).
# MJPEG is LOSSY (per-frame JPEG), so like JPEG this container is
# pytest-pinned with error bounds, not driver-oracle'd.


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Walk RIFF chunks in buf[pos:end] → (fourcc, body_start, size);
    chunks are word-aligned (odd sizes carry one pad byte)."""
    while pos + 8 <= end:
        cc = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"truncated AVI chunk {cc!r} ({size} bytes claimed, "
                f"{end - body} remain)"
            )
        yield cc, body, size
        pos = body + size + (size & 1)


def decode_avi(buf: bytes) -> tuple[list[np.ndarray], float]:
    """MJPEG AVI → (list of decoded frames, fps). Every frame decodes
    through decode_jpeg (with the MJPEG missing-DHT fallback); frame
    shapes must agree; per-frame AND total decoded pixels are capped
    (untrusted-input contract — headers declare sizes independently of
    input bytes)."""
    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    end = min(len(buf), 8 + int.from_bytes(buf[4:8], "little"))
    micro_per_frame = 0
    vids_handler: bytes | None = None
    frame_bufs: list[bytes] = []

    def collect_movi(start: int, stop: int) -> None:
        for cc, s, z in _riff_chunks(buf, start, stop):
            if cc == b"LIST" and buf[s : s + 4] == b"rec ":
                collect_movi(s + 4, s + z)
            elif cc[2:4] in (b"dc", b"db") and z > 0:
                frame_bufs.append(buf[s : s + z])

    for cc, start, size in _riff_chunks(buf, 12, end):
        if cc != b"LIST":
            continue
        ltype = buf[start : start + 4]
        if ltype == b"hdrl":
            for cc2, s2, z2 in _riff_chunks(buf, start + 4, start + size):
                if cc2 == b"avih" and z2 >= 4:
                    micro_per_frame = int.from_bytes(buf[s2 : s2 + 4], "little")
                elif cc2 == b"LIST" and buf[s2 : s2 + 4] == b"strl":
                    for cc3, s3, z3 in _riff_chunks(buf, s2 + 4, s2 + z2):
                        if cc3 == b"strh" and z3 >= 8 \
                                and buf[s3 : s3 + 4] == b"vids":
                            vids_handler = bytes(buf[s3 + 4 : s3 + 8])
        elif ltype == b"movi":
            collect_movi(start + 4, start + size)
    if vids_handler is None:
        raise ValueError("AVI stream has no video stream header (strh vids)")
    if vids_handler.lower() not in (b"mjpg", b"jpeg", b"\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"AVI video codec {vids_handler!r} unsupported (MJPG only)"
        )
    if not frame_bufs:
        raise ValueError("AVI stream contains no video frames")
    frames: list[np.ndarray] = []
    total_px = 0
    for fb in frame_bufs:
        px = decode_jpeg(fb, default_tables=True)
        if frames and px.shape != frames[0].shape:
            raise ValueError(
                f"AVI frame shape {px.shape} differs from {frames[0].shape}"
            )
        total_px += px.shape[0] * px.shape[1]
        if total_px > MAX_DECODE_PIXELS:
            raise ValueError(
                f"AVI total decoded pixels exceed the {MAX_DECODE_PIXELS} cap"
            )
        frames.append(px)
    fps = 1e6 / micro_per_frame if micro_per_frame else 0.0
    return frames, fps


def _riff_chunk(cc: bytes, body: bytes) -> bytes:
    return cc + len(body).to_bytes(4, "little") + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


def encode_avi(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 90
) -> bytes:
    """Frames ((h, w[, 1|3]) uint8, equal shapes) → MJPEG AVI: standard
    hdrl (avih + one vids strl with an MJPG strh and a BITMAPINFOHEADER
    strf) + movi with one '00dc' JPEG per frame. For round-trip tests
    and the frame-sampling pipeline — per-frame JPEG is lossy."""
    if not frames:
        raise ValueError("encode_avi requires at least one frame")
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    jpegs = []
    for f in frames:
        f = np.asarray(f)
        if f.shape[:2] != (h, w):
            raise ValueError("encode_avi frames must share one shape")
        jpegs.append(encode_jpeg(f, quality=quality))
    buf_size = max(len(j) for j in jpegs)
    n = len(jpegs)
    micro = int(round(1e6 / fps))
    avih = struct.pack(
        "<10I", micro, buf_size * int(fps) + 1, 0, 0x10, n, 0, 1, buf_size,
        w, h,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<I", 0)
        + struct.pack("<HH", 0, 0)          # priority, language
        + struct.pack("<IIIII", 0, 1, int(round(fps)), 0, n)  # init, scale,
        # rate, start, length
        + struct.pack("<IIi", buf_size, 0, 0)  # bufsize, quality, samplesize
        + struct.pack("<4h", 0, 0, w, h)    # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                     + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(
        b"movi", b"".join(_riff_chunk(b"00dc", j) for j in jpegs)
    )
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)
