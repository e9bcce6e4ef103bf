"""Multimodal plumbing: binary schema, actor decode stage, frame sampling.
The decode kernel is a documented stub (real decoder raises
NotImplementedError); the Ray-side plumbing is real."""

import pytest

from agenticknowledgegraphconstructionsystem_ray.stages import multimodal

SF = "/root/testdata/sf0.001"


def test_decode_meta_roundtrip():
    out = multimodal.decode_meta(SF).to_pandas()
    assert len(out) == 500
    assert set(out["format"]) == {"IMG1", "AUD1", "VID1"}
    # header fields decode to the planted values
    row = out[out["media_id"] == 3].iloc[0]
    assert row["kind"] == "image" if 3 % 3 == 0 else True
    assert (out["width"] >= 16).all() and (out["width"] < 656).all()
    assert (out["body_bytes"] > 0).all()


def test_kind_assignment():
    out = multimodal.decode_meta(SF).to_pandas()
    for _, r in out.head(20).iterrows():
        expect = {0: ("image", "IMG1"), 1: ("audio", "AUD1"), 2: ("video", "VID1")}[
            r["media_id"] % 3
        ]
        assert (r["kind"], r["format"]) == expect


def test_frame_sampler_counts():
    frames = multimodal.sampled_frames(SF, stride=4).to_pandas()
    assert len(frames) > 0
    meta = multimodal.decode_meta(SF).to_pandas().set_index("media_id")
    for _, r in frames.head(10).iterrows():
        body = meta.loc[r["media_id"], "body_bytes"]
        n_frames = -(-body // multimodal.FRAME_BYTES)
        assert r["n_sampled_frames"] == -(-n_frames // 4)


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        multimodal.DecodeMedia(real_decode=True)


# ---------------------------------------------------------------------------
# real container-format sniffers (functions/mediasniff.py) — hand-written
# byte literals, NOT the builders, so a shared builder/sniffer bug can't hide
# ---------------------------------------------------------------------------

from agenticknowledgegraphconstructionsystem_ray.functions import mediasniff as ms


def test_sniff_png_literal():
    b = (b"\x89PNG\r\n\x1a\n"
         + b"\x00\x00\x00\x0dIHDR"
         + b"\x00\x00\x01\x00"   # width 256 big-endian
         + b"\x00\x00\x00\x10"   # height 16
         + b"\x08\x02\x00\x00\x00" + b"\xde\xad\xbe\xef" + b"rest")
    assert ms.sniff(b) == ("PNG", 256, 16, 33)


def test_sniff_gif_literal():
    b = b"GIF89a" + b"\x40\x01" + b"\xf0\x00" + b"\x00\x00\x00" + b"tail"
    assert ms.sniff(b) == ("GIF", 320, 240, 13)


def test_sniff_bmp_literal():
    b = (b"BM" + b"\x00" * 8 + b"\x36\x00\x00\x00"
         + b"\x28\x00\x00\x00"          # info header size 40
         + b"\x20\x00\x00\x00"          # width 32 LE
         + b"\xe0\xff\xff\xff"          # height -32 (top-down) -> abs
         + b"\x01\x00\x18\x00" + b"\x00" * 24 + b"pixels")
    assert ms.sniff(b) == ("BMP", 32, 32, 54)


def test_sniff_jpeg_walks_past_other_segments():
    app0 = b"\xff\xe0" + b"\x00\x10" + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + b"\x00\x05" + b"\x00\x01\x02"
    sof = b"\xff\xc2" + b"\x00\x0b" + b"\x08" + b"\x00\x64" + b"\x00\xc8" + b"\x01\x01\x11\x00"
    b = b"\xff\xd8" + app0 + dqt + sof + b"entropy..."
    fmt, w, h, hdr = ms.sniff(b)
    assert (fmt, w, h) == ("JPEG", 200, 100)
    assert hdr == 2 + len(app0) + len(dqt) + len(sof)


def test_sniff_wav_walks_past_list_chunk():
    import struct
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    data = b"data" + struct.pack("<I", 6) + b"abcdef"
    b = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + lst + fmt + data
    out = ms.sniff(b)
    assert out == ("WAV", 44100, 2, len(b) - 6)


def test_sniff_rejects_garbage_and_truncation():
    assert ms.sniff(b"") is None
    assert ms.sniff(b"hello world this is not an image") is None
    assert ms.sniff(b"IMG1" + b"\x00" * 40) is None        # the fake format
    assert ms.sniff(b"\x89PNG\r\n\x1a\n\x00\x00") is None   # truncated PNG
    assert ms.sniff(b"\xff\xd8\xff\xd9") is None            # JPEG, EOI before SOF


def test_builders_roundtrip_through_sniffers():
    body = b"B" * 100
    assert ms.sniff(ms.build_png(640, 480, body)) == ("PNG", 640, 480, 33)
    assert ms.sniff(ms.build_gif(13, 7, body)) == ("GIF", 13, 7, 13)
    assert ms.sniff(ms.build_bmp(1920, 1080, body)) == ("BMP", 1920, 1080, 54)
    assert ms.sniff(ms.build_jpeg(320, 240, body)) == ("JPEG", 320, 240, 15)
    assert ms.sniff(ms.build_wav(16000, 1, body)) == ("WAV", 16000, 1, 44)


def test_sniff_meta_pipeline(ray_session):
    out = multimodal.sniff_meta(SF).to_pandas()
    assert len(out) == 500
    assert set(out["format"]) == {"PNG", "GIF", "BMP", "JPEG", "WAV"}
    assert out["width"].notna().all() and (out["body_bytes"] > 0).all()
    for _, r in out.head(10).iterrows():
        if r["media_id"] % 5 == 3:
            assert r["format"] == "JPEG"


def test_sniff_real_world_header_variants():
    import struct

    # BMP with a 124-byte V5 info header: header_len must follow the
    # pixel-data offset field, not a hardcoded 54
    off = 14 + 124
    v5 = (b"BM" + struct.pack("<IHHI", off + 8, 0, 0, off)
          + struct.pack("<Iii", 124, 10, 10) + b"\x00" * (124 - 12)
          + b"12345678")
    assert ms.sniff(v5) == ("BMP", 10, 10, off)
    # GIF with a global color table: 2-entry-exponent palette is header
    flags = 0x80 | 0x01  # GCT present, size N=1 -> 3 * 2^2 = 12 bytes
    gif = b"GIF89a" + struct.pack("<HH", 5, 7) + bytes([flags, 0, 0]) + b"\x00" * 12 + b"body"
    assert ms.sniff(gif) == ("GIF", 5, 7, 13 + 12)
    # WAV whose trailing chunk declares more bytes than the buffer: reject
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    bogus = b"LIST" + struct.pack("<I", 1000) + b"IN"
    wav = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + fmt + bogus
    assert ms.sniff(wav) is None
    # WAV with no data chunk at all: reject (not playable, no body bound)
    wav2 = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + fmt
    assert ms.sniff(wav2) is None


# ---------------------------------------------------------------------------
# REAL pixel/sample codecs (functions/mediadecode.py)
# ---------------------------------------------------------------------------

import numpy as np
import struct
import zlib

from agenticknowledgegraphconstructionsystem_ray.functions import mediadecode as md


def test_png_roundtrip_all_filters():
    # >= 5 rows so encode's row%5 cycle exercises every filter type
    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (5, 3), (7, 7), (33, 49), (64, 17)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(md.decode_png(md.encode_png(px)), px)


def test_png_decode_hand_built_literal():
    # hand-assembled 2x2 PNG: row 0 filter None, row 1 filter Up —
    # NOT produced by our encoder, so a compensating encode/decode bug
    # cannot hide. Expected recon computed by hand.
    raw0 = bytes([10, 20, 30, 40, 50, 60])
    up_delta = bytes([1, 2, 3, 4, 5, 6])
    stream = b"\x00" + raw0 + b"\x02" + up_delta
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(stream)) + chunk(b"IEND", b""))
    out = md.decode_png(png)
    assert out.shape == (2, 2, 3)
    assert out[0].ravel().tolist() == [10, 20, 30, 40, 50, 60]
    assert out[1].ravel().tolist() == [11, 22, 33, 44, 55, 66]


def test_png_decode_sub_filter_literal():
    # single row, filter Sub: recon is the cumulative sum per channel
    stream = b"\x01" + bytes([100, 0, 0, 50, 1, 0, 200, 2, 0])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(stream)) + chunk(b"IEND", b""))
    out = md.decode_png(png)
    # channel 0: 100, 150, 350%256=94; ch1: 0, 1, 3; ch2: 0
    assert out[0, :, 0].tolist() == [100, 150, 94]
    assert out[0, :, 1].tolist() == [0, 1, 3]
    assert out[0, :, 2].tolist() == [0, 0, 0]


def test_png_decode_rejects_bad_crc():
    px = np.zeros((2, 2, 3), np.uint8)
    b = bytearray(md.encode_png(px))
    b[-5] ^= 0xFF  # corrupt IEND CRC
    import pytest as _pytest
    with _pytest.raises(ValueError, match="CRC"):
        md.decode_png(bytes(b))


def test_bmp_roundtrip_and_padding():
    rng = np.random.default_rng(1)
    # widths chosen so 3*w % 4 covers all residues (stride padding paths)
    for w in (1, 2, 3, 4, 5):
        px = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
        b = md.encode_bmp(px)
        stride = (w * 3 + 3) & ~3
        assert len(b) == 54 + 3 * stride
        assert np.array_equal(md.decode_bmp(b), px)


def test_bmp_decode_top_down_literal():
    # hand-built 1x2 top-down (negative height) BMP, BGR order
    pixel_row = bytes([255, 0, 0, 0, 0, 255]) + b"\x00\x00"  # blue px, red px + pad
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 24, 0, len(pixel_row), 0, 0, 0, 0)
    b = b"BM" + struct.pack("<IHHI", 54 + len(pixel_row), 0, 0, 54) + info + pixel_row
    out = md.decode_bmp(b)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [0, 0, 255]   # BGR 255,0,0 -> RGB blue
    assert out[0, 1].tolist() == [255, 0, 0]


def test_wav_roundtrip_mono_stereo():
    for channels in (1, 2):
        s = (np.arange(400, dtype=np.int64).reshape(-1, channels) * 37 % 65536 - 32768).astype(np.int16)
        rate, out = md.decode_wav(md.encode_wav(22050, s))
        assert rate == 22050
        assert np.array_equal(out, s)


def test_wav_decode_literal_with_list_chunk():
    samples = struct.pack("<4h", -1, 2, -3, 4)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    b = (b"RIFF" + struct.pack("<I", 1000) + b"WAVE" + lst + fmt
         + b"data" + struct.pack("<I", len(samples)) + samples)
    rate, out = md.decode_wav(b)
    assert rate == 8000 and out.shape == (2, 2)
    assert out.ravel().tolist() == [-1, 2, -3, 4]


def test_gif_roundtrip_shapes_and_palette():
    rng = np.random.default_rng(2)
    for shape in ((1, 1), (5, 7), (33, 49)):
        idx = rng.integers(0, 256, shape, dtype=np.uint8)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        out = md.decode_gif(md.encode_gif(idx, pal))
        assert np.array_equal(out, pal[idx])


def test_gif_lzw_kwkwk_and_dict_reset():
    pal = np.arange(768, dtype=np.int64).reshape(256, 3).astype(np.uint8)
    # constant image: long runs force the KwKwK just-defined-code path
    idx = np.full((40, 60), 7, np.uint8)
    assert np.array_equal(md.decode_gif(md.encode_gif(idx, pal)), pal[idx])
    # high-entropy image large enough to fill the 4096-entry dictionary and
    # force a mid-stream CLEAR + reset
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    assert np.array_equal(md.decode_gif(md.encode_gif(idx, pal)), pal[idx])


def test_gif_decode_skips_extensions_and_rejects_truncation():
    idx, pal = multimodal.synth_indexed(3)
    b = md.encode_gif(idx, pal)
    # splice a GIF89a graphics-control extension after the color table
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    cut = 13 + 768
    spliced = b[:cut] + ext + b[cut:]
    assert np.array_equal(md.decode_gif(spliced), pal[idx])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        md.decode_gif(b[: len(b) // 2])


def test_decode_pixels_pipeline_matches_formula(ray_session):
    out = multimodal.decode_pixels(SF).to_pandas().set_index("media_id")
    assert len(out) == 500
    for doc_id in (0, 1, 2, 3, 4, 30, 31, 32, 33, 34):
        r = out.loc[doc_id]
        k = doc_id % 5
        if k in (0, 1):
            arr = multimodal.synth_pixels(doc_id).astype(np.int64)
            assert r["format"] == ("PNG" if k == 0 else "BMP")
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
        elif k == 2:
            rate, s = multimodal.synth_samples(doc_id)
            arr = s.astype(np.int64)
            assert r["format"] == "WAV"
            assert (r["width"], r["height"]) == (rate, s.shape[1])
        elif k == 3:
            arr = multimodal.synth_gif_rgb(doc_id).astype(np.int64)
            assert r["format"] == "GIF"
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
        else:
            arr = multimodal.synth_blocks(doc_id).astype(np.int64)
            assert r["format"] == "JPEG"
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
        assert r["n_values"] == arr.size
        assert r["sum_values"] == arr.sum()
        assert r["min_value"] == arr.min()
        assert r["max_value"] == arr.max()


def test_resize_stats_pipeline(ray_session):
    out = multimodal.resize_stats(SF).to_pandas().set_index("media_id")
    # every doc except WAVs (doc_id % 5 == 2) yields a resizable image
    assert set(out.index) == {i for i in range(500) if i % 5 != 2}
    for doc_id in (0, 1, 3, 4, 5):
        k = doc_id % 5
        if k == 3:
            arr = multimodal.synth_gif_rgb(doc_id)
        elif k == 4:
            arr = multimodal.synth_blocks(doc_id)
        else:
            arr = multimodal.synth_pixels(doc_id)
        h2, w2 = arr.shape[0] // 2, arr.shape[1] // 2
        a = arr[: h2 * 2, : w2 * 2].astype(np.int64)
        if a.ndim == 2:
            small = a.reshape(h2, 2, w2, 2).sum(axis=(1, 3)) // 4
        else:
            small = a.reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3)) // 4
        r = out.loc[doc_id]
        assert (r["resized_w"], r["resized_h"]) == (w2, h2)
        assert r["sum_resized"] == small.sum()


# ---------------------------------------------------------------------------
# JPEG codec
# ---------------------------------------------------------------------------

def test_jpeg_block_constant_roundtrip_exact():
    """Block-constant mosaics round-trip EXACTLY (only DC coefficients, no
    quantization loss at Q=1) — the invariant the golden corpus relies on."""
    for doc_id in (4, 9, 14, 19, 104):
        img = multimodal.synth_blocks(doc_id)
        out = md.decode_jpeg_gray(md.encode_jpeg_gray(img))
        assert np.array_equal(out, img)


def test_jpeg_general_image_near_exact_and_odd_dims():
    """Non-constant blocks exercise AC run-length coding (ZRL, EOB, all
    magnitude categories); at Q=1 the only loss is DCT-coefficient rounding
    (<= 1 gray level here). Odd dims exercise pad-to-MCU + crop."""
    g = ((np.arange(24)[:, None] * 3 + np.arange(40)[None, :] * 7) % 256).astype(np.uint8)
    o = md.decode_jpeg_gray(md.encode_jpeg_gray(g))
    assert o.shape == g.shape
    assert np.abs(o.astype(int) - g.astype(int)).max() <= 1
    rng = np.random.default_rng(5)
    r = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    o2 = md.decode_jpeg_gray(md.encode_jpeg_gray(r))
    assert o2.shape == (13, 21)
    assert np.abs(o2.astype(int) - r.astype(int)).max() <= 2


def test_jpeg_quant_divisor_and_byte_stuffing():
    """A coarser quant table still decodes (lossy but bounded by quant/2 per
    coefficient); encoder must byte-stuff any 0xFF in the entropy stream."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    b = md.encode_jpeg_gray(img, quant=8)
    out = md.decode_jpeg_gray(b)
    assert out.shape == img.shape
    # Parseval-ish bound: per-pixel error <= sum of 64 coeff errors / 8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8 * 64 // 16


def test_jpeg_rejects_color_progressive_and_garbage():
    import pytest as _pytest

    from agenticknowledgegraphconstructionsystem_ray.functions import mediasniff as ms

    with _pytest.raises(ValueError):
        md.decode_jpeg_gray(b"not a jpeg")
    # the sniffer-corpus JPEG (header + raw text body) has no DHT/SOS scan
    with _pytest.raises(ValueError):
        md.decode_jpeg_gray(ms.build_jpeg(16, 16, b"x" * 64))
    # color SOF0: 3 components
    img = multimodal.synth_blocks(4)
    b = md.encode_jpeg_gray(img)
    i = b.find(b"\xff\xc0")
    bad = bytearray(b)
    bad[i + 9] = 3  # ncomp
    with _pytest.raises(ValueError, match="color"):
        md.decode_jpeg_gray(bytes(bad))
    # progressive marker
    bad2 = bytearray(b)
    bad2[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        md.decode_jpeg_gray(bytes(bad2))
