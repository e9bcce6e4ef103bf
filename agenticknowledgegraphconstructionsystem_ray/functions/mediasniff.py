"""Pure header sniffers for real media container formats.

At 100 TB you never decode a blob to learn its shape — you parse the first
few hundred bytes. These are real parsers for the actual on-disk formats
(PNG / GIF / BMP / JPEG / WAV), pure Python over ``bytes`` (no image/audio
libraries needed), used by the multimodal metadata stage
(``stages/multimodal.py``). Pixel/sample DECODING remains out of scope in
this container (the marked stub boundary); header metadata is fully real.

Each sniffer returns ``(format, width, height, header_len)`` or ``None`` if
the payload is not that format. For WAV, ``width`` = sample rate (Hz) and
``height`` = channel count — the dimension analog for audio.

Reference parity: the reference stores media-free papers, so this family is
a beyond-reference training-data operator (multimodal columns).
"""

from __future__ import annotations

import struct

# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG ext,
# CC=DAC are NOT SOF)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def sniff_png(b: bytes):
    """PNG: 8-byte signature, then the IHDR chunk (must be first per spec):
    4-byte length, b'IHDR', 13-byte data (width, height big-endian u32, ...),
    4-byte CRC."""
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return ("PNG", w, h, 33)


def sniff_gif(b: bytes):
    """GIF87a/89a: 6-byte signature + logical screen descriptor
    (width, height little-endian u16, flags, bg, aspect = 7 bytes), plus the
    Global Color Table when the flags bit says one follows — real files
    usually carry one, and it belongs to the header, not the body."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    hdr = 13
    if flags & 0x80:  # GCT present: 3 * 2^(N+1) palette bytes
        hdr += 3 * (2 << (flags & 0x07))
        if hdr > len(b):
            return None
    return ("GIF", w, h, hdr)


def sniff_bmp(b: bytes):
    """BMP: 14-byte file header + BITMAPINFOHEADER-or-later (size >= 40,
    width/height little-endian i32; height may be negative = top-down).
    header_len comes from the file header's pixel-data offset field
    (bytes 10-13) — V4/V5 info headers are longer than 40 bytes, so a fixed
    54 would count header bytes as body."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        return None
    off = struct.unpack("<I", b[10:14])[0]
    if off < 14 + hdr_size or off > len(b):
        return None
    w, h = struct.unpack("<ii", b[18:26])
    return ("BMP", w, abs(h), off)


def sniff_jpeg(b: bytes):
    """JPEG: SOI then a marker-segment walk to the first SOFn frame header
    (height, width big-endian u16 at offsets +5/+7 into the segment). This is
    the scan every real tool does — dimensions are NOT at a fixed offset."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None  # desynced: not a marker where one must be
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length field
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if marker in _JPEG_SOF:
            if seg_len < 7:
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return ("JPEG", w, h, i + 2 + seg_len)
        i += 2 + seg_len
    return None


def sniff_wav(b: bytes):
    """RIFF/WAVE: 12-byte RIFF header, then a chunk walk to 'fmt ' (chunk
    walk, not fixed offset — real files may carry LIST/INFO chunks first).
    Returns sample rate as width, channel count as height; header_len =
    offset just past the 'data' chunk header when present, else past fmt."""
    if len(b) < 36 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    n = len(b)
    rate = channels = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            if size < 16 or i + 8 + 16 > n:
                return None
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
        elif cid == b"data":
            if rate is None:
                return None
            return ("WAV", rate, channels, i + 8)
        i += 8 + size + (size & 1)  # chunks are word-aligned
        if i > n:
            return None  # chunk declares more bytes than the buffer holds
    # no 'data' chunk found: not a playable WAV — reject rather than guess
    # a header_len that could exceed the buffer (negative body downstream)
    return None


_SNIFFERS = (sniff_png, sniff_gif, sniff_bmp, sniff_jpeg, sniff_wav)


def sniff(b: bytes):
    """Try every known container; first match wins (magics are disjoint).
    Returns (format, width, height, header_len) or None for unknown bytes."""
    for s in _SNIFFERS:
        out = s(b)
        if out is not None:
            return out
    return None


# ---------------------------------------------------------------------------
# Deterministic builders — minimal VALID files for the formats above, used to
# synthesize a real-container corpus from the documents table (and by tests).
# Builders and sniffers are inverse by construction; tests additionally pin
# hand-written byte literals so a shared bug cannot hide.
# ---------------------------------------------------------------------------

def build_png(w: int, h: int, body: bytes) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"  # 8-bit RGB
    import zlib

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + body
    )


def build_gif(w: int, h: int, body: bytes) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + body


def build_bmp(w: int, h: int, body: bytes) -> bytes:
    info = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return file_hdr + info + body


def build_jpeg(w: int, h: int, body: bytes) -> bytes:
    # SOI + one SOF0 with a single component: payload = 2(len) + 6 + 3
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + sof + body


def build_wav(rate: int, channels: int, body: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(body))
        + body
    )
