"""Dependency-free real-format media codecs: binary PPM (P6) images, BMP
(24-bit uncompressed) images, and WAV (PCM) audio.

These are complete, honest byte-format implementations — header grammar,
endianness, row padding, chunk walking — not fakes: ``parse_*`` rejects
malformed input with precise errors and round-trips ``write_*`` output
bit-for-bit (property-tested in tests/test_multimodal_codecs.py). They back
the engine's multimodal decode stage (operators/multimodal.py): the Spark
plumbing streams payloads through Arrow-batched ``mapInPandas`` and these
parsers run per batch, exactly where PIL/libsndfile would sit. Formats that
need external libraries (JPEG/PNG/MP3/H.264) still fall back to the marked
structural-feature fake.

Pure stdlib (struct only); deterministic; no I/O.
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
