"""Dependency-free real-format media codecs: binary PPM (P6), BMP (24-bit
uncompressed), and PNG (8-bit RGB/RGBA, deflate) images, and WAV (PCM) audio.

These are complete, honest byte-format implementations — header grammar,
endianness, row padding, chunk walking, CRC verification, all five PNG
scanline filters — not fakes: ``parse_*`` rejects malformed input with
precise errors and round-trips ``write_*`` output bit-for-bit
(property-tested in tests/test_multimodal_codecs.py). They back the
engine's multimodal decode stage (operators/multimodal.py): the Spark
plumbing streams payloads through Arrow-batched ``mapInPandas`` and these
parsers run per batch, exactly where PIL/libsndfile would sit. Formats that
need external libraries (JPEG/MP3/H.264) still fall back to the marked
structural-feature fake.

Pure stdlib (struct + zlib); deterministic; no I/O.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class CodecError(ValueError):
    """Malformed media payload."""


# ---------------------------------------------------------------------------
# PPM — binary "P6" portable pixmap: the simplest real raster format
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PpmImage:
    width: int
    height: int
    maxval: int
    pixels: bytes  # RGB triples, row-major, len == width*height*3

    def channel_sums(self) -> tuple[int, int, int]:
        """Exact per-channel pixel sums (the decode-stage feature columns)."""
        return (
            sum(self.pixels[0::3]),
            sum(self.pixels[1::3]),
            sum(self.pixels[2::3]),
        )


def write_ppm(width: int, height: int, pixels: bytes, maxval: int = 255) -> bytes:
    if maxval < 1 or maxval > 255:
        raise CodecError(f"maxval out of range for 1-byte samples: {maxval}")
    if len(pixels) != width * height * 3:
        raise CodecError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * 3}"
        )
    return f"P6\n{width} {height}\n{maxval}\n".encode("ascii") + pixels


def _read_ppm_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited header token, skipping '#' comments (the
    PPM grammar allows comments anywhere between tokens)."""
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise CodecError("truncated PPM header")
    return buf[start:pos], pos


def parse_ppm(payload: bytes) -> PpmImage:
    if payload[:2] != b"P6":
        raise CodecError(f"not a binary PPM (magic {payload[:2]!r})")
    pos = 2
    fields = []
    for _ in range(3):
        tok, pos = _read_ppm_token(payload, pos)
        if not tok.isdigit():
            raise CodecError(f"non-numeric PPM header token {tok!r}")
        fields.append(int(tok))
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise CodecError(f"bad PPM dimensions {width}x{height}")
    if not 0 < maxval < 65536:
        raise CodecError(f"bad PPM maxval {maxval}")
    if maxval > 255:
        raise CodecError("16-bit-per-sample PPM not supported")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    need = width * height * 3
    pixels = payload[pos : pos + need]
    if len(pixels) != need:
        raise CodecError(f"PPM raster truncated: {len(pixels)} of {need} bytes")
    return PpmImage(width, height, maxval, pixels)


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed BITMAPINFOHEADER, the classic Windows format
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BmpImage:
    width: int
    height: int
    #: RGB triples, row-major TOP-DOWN (normalized from BMP's bottom-up,
    #: BGR, 4-byte-padded rows)
    pixels: bytes

    def channel_sums(self) -> tuple[int, int, int]:
        return (
            sum(self.pixels[0::3]),
            sum(self.pixels[1::3]),
            sum(self.pixels[2::3]),
        )


def _bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def write_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit BMP from top-down RGB triples."""
    if len(pixels) != width * height * 3:
        raise CodecError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * 3}"
        )
    stride = _bmp_row_stride(width)
    img_size = stride * height
    off_bits = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off_bits + img_size, 0, 0, off_bits)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = pixels[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - width * 3)
        rows += row
    return header + info + bytes(rows)


def parse_bmp(payload: bytes) -> BmpImage:
    if payload[:2] != b"BM":
        raise CodecError(f"not a BMP (magic {payload[:2]!r})")
    if len(payload) < 54:
        raise CodecError("BMP header truncated")
    _, _file_size, _, _, off_bits = struct.unpack_from("<2sIHHI", payload, 0)
    header_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise CodecError(f"unsupported BMP header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if planes != 1 or bpp != 24 or compression != 0:
        raise CodecError(
            f"only 24-bit uncompressed BMP supported (planes={planes}, "
            f"bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise CodecError(f"bad BMP dimensions {width}x{height}")
    stride = _bmp_row_stride(width)
    if len(payload) < off_bits + stride * height:
        raise CodecError("BMP pixel data truncated")
    out = bytearray(width * height * 3)
    for row_i in range(height):
        src_row = (height - 1 - row_i) if bottom_up else row_i
        base = off_bits + src_row * stride
        dst = row_i * width * 3
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return BmpImage(width, height, bytes(out))


# ---------------------------------------------------------------------------
# PNG — real deflate-compressed rasters (zlib is stdlib): chunk walking with
# CRC verification, IHDR validation, and full scanline un-filtering
# ---------------------------------------------------------------------------

_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


@dataclass(frozen=True)
class PngImage:
    width: int
    height: int
    #: 3 for RGB (color type 2), 4 for RGBA (color type 6)
    n_channels: int
    #: un-filtered samples, row-major top-down, len == width*height*n_channels
    pixels: bytes

    def channel_sums(self) -> tuple[int, int, int]:
        """Exact per-RGB-channel sums (alpha excluded for RGBA)."""
        nc = self.n_channels
        return (
            sum(self.pixels[0::nc]),
            sum(self.pixels[1::nc]),
            sum(self.pixels[2::nc]),
        )


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def write_png(width: int, height: int, pixels: bytes, n_channels: int = 3) -> bytes:
    """8-bit RGB/RGBA PNG from top-down samples (filter 0 scanlines)."""
    import zlib

    if n_channels not in (3, 4):
        raise CodecError(f"only RGB/RGBA supported ({n_channels} channels)")
    if len(pixels) != width * height * n_channels:
        raise CodecError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * n_channels}"
        )
    color_type = 2 if n_channels == 3 else 6
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * n_channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/Paeth)."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise CodecError(
            f"PNG raster is {len(raw)} bytes, need {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev_row_start = -1
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        row = raw[base + 1 : base + 1 + stride]
        dst = y * stride
        if ftype == 0:  # None
            out[dst : dst + stride] = row
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[dst + x - bpp] if x >= bpp else 0
                out[dst + x] = (row[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                b = out[prev_row_start + x] if y > 0 else 0
                out[dst + x] = (row[x] + b) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[dst + x - bpp] if x >= bpp else 0
                b = out[prev_row_start + x] if y > 0 else 0
                out[dst + x] = (row[x] + (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[dst + x - bpp] if x >= bpp else 0
                b = out[prev_row_start + x] if y > 0 else 0
                c = out[prev_row_start + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[dst + x] = (row[x] + pred) & 0xFF
        else:
            raise CodecError(f"unknown PNG filter type {ftype} on row {y}")
        prev_row_start = dst
    return bytes(out)


def parse_png(payload: bytes) -> PngImage:
    import zlib

    if payload[:8] != _PNG_SIGNATURE:
        raise CodecError(f"not a PNG (signature {payload[:8]!r})")
    pos = 8
    ihdr: tuple | None = None
    idat = bytearray()
    ended = False
    while pos + 8 <= len(payload) and not ended:
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size or pos + 12 + size > len(payload):
            raise CodecError(f"PNG chunk {ctype!r} truncated")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise CodecError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
        pos += 12 + size
    if ihdr is None:
        raise CodecError("PNG has no IHDR chunk")
    if not ended:
        raise CodecError("PNG has no IEND chunk")
    width, height, bit_depth, color_type, compression, filter_m, interlace = ihdr
    if bit_depth != 8 or color_type not in (2, 6):
        raise CodecError(
            f"only 8-bit RGB/RGBA PNG supported (depth={bit_depth}, color={color_type})"
        )
    if compression != 0 or filter_m != 0 or interlace != 0:
        raise CodecError(
            f"unsupported PNG encoding (compression={compression}, "
            f"filter={filter_m}, interlace={interlace})"
        )
    if width <= 0 or height <= 0:
        raise CodecError(f"bad PNG dimensions {width}x{height}")
    if not idat:
        raise CodecError("PNG has no IDAT data")
    n_channels = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise CodecError(f"PNG IDAT inflate failed: {exc}") from exc
    return PngImage(
        width, height, n_channels, _png_unfilter(raw, width, height, n_channels)
    )


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE with PCM fmt chunk; real chunk walking, not offset 44
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WavAudio:
    n_channels: int
    sample_rate: int
    bits_per_sample: int
    data: bytes  # raw PCM frames from the data chunk

    @property
    def n_frames(self) -> int:
        return len(self.data) // (self.n_channels * (self.bits_per_sample // 8))

    @property
    def duration_ms(self) -> int:
        return (self.n_frames * 1000) // self.sample_rate


def write_wav(
    data: bytes, n_channels: int = 1, sample_rate: int = 8000, bits_per_sample: int = 16
) -> bytes:
    block_align = n_channels * (bits_per_sample // 8)
    if block_align == 0 or len(data) % block_align:
        raise CodecError(f"data length {len(data)} not a multiple of frame size {block_align}")
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits_per_sample,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes) -> WavAudio:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError(f"not a RIFF/WAVE file (magic {payload[:4]!r}/{payload[8:12]!r})")
    if len(payload) < 12:
        raise CodecError("WAV header truncated")
    fmt: tuple | None = None
    data: bytes | None = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise CodecError(f"WAV chunk {cid!r} truncated: {len(chunk)} of {size} bytes")
        if cid == b"fmt ":
            if size < 16:
                raise CodecError(f"fmt chunk too small ({size} bytes)")
            audio_format, n_ch, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", chunk, 0
            )
            if audio_format != 1:
                raise CodecError(f"only PCM WAV supported (format {audio_format})")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None:
        raise CodecError("WAV has no fmt chunk")
    if data is None:
        raise CodecError("WAV has no data chunk")
    n_ch, rate, bits = fmt
    if n_ch < 1 or rate < 1 or bits not in (8, 16, 24, 32):
        raise CodecError(f"bad WAV fmt (channels={n_ch}, rate={rate}, bits={bits})")
    return WavAudio(n_ch, rate, bits, data)
