"""Windows BMP codec pins (operators/bmp.py)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.bmp import (
    decode_bmp,
    encode_bmp,
    rle8_decode,
    rle8_encode,
)

PAL = np.stack([4 * np.arange(16), 8 * np.arange(16), 12 * np.arange(16)],
               axis=1).astype(np.uint8)


def _idx(h=21, w=13):
    y, x = np.mgrid[0:h, 0:w]
    return ((x + y) % 16).astype(np.uint8)


def _rgb(h=21, w=13):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(3 * x) % 256, (5 * y) % 256, (x * y) % 256],
                    axis=2).astype(np.uint8)


def test_roundtrip_matrix():
    idx, rgb = _idx(), _rgb()
    assert np.array_equal(decode_bmp(encode_bmp(idx, palette=PAL)), PAL[idx])
    assert np.array_equal(
        decode_bmp(encode_bmp(idx, palette=PAL, top_down=True)), PAL[idx]
    )
    assert np.array_equal(
        decode_bmp(encode_bmp(idx, palette=PAL, compression=1)), PAL[idx]
    )
    assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)
    assert np.array_equal(decode_bmp(encode_bmp(rgb, top_down=True)), rgb)
    # width not a multiple of 4 exercises row padding in both depths
    for w in (1, 2, 3, 5):
        assert np.array_equal(
            decode_bmp(encode_bmp(_idx(5, w), palette=PAL)), PAL[_idx(5, w)]
        )
        assert np.array_equal(decode_bmp(encode_bmp(_rgb(5, w))), _rgb(5, w))


def test_rle8_escape_codes():
    # absolute run (0 n>=3) with word padding
    out = rle8_decode(bytes([0, 4, 9, 8, 7, 6, 0, 0, 0, 1]), 4, 1)
    assert list(out[0]) == [9, 8, 7, 6]
    # odd absolute run is padded to a word: 0 3 a b c PAD
    out = rle8_decode(bytes([0, 3, 9, 8, 7, 0, 0, 0, 0, 1]), 4, 1)
    assert list(out[0]) == [9, 8, 7, 0]
    # delta (0 2 dx dy): skipped pixels stay 0
    out = rle8_decode(bytes([2, 5, 0, 2, 2, 0, 1, 7, 0, 0, 0, 1]), 5, 1)
    assert list(out[0]) == [5, 5, 0, 0, 7]
    # encoder output round-trips
    idx = _idx(9, 31)
    assert np.array_equal(rle8_decode(rle8_encode(idx), 31, 9), idx)


def test_corrupt_and_hostile():
    good = encode_bmp(_idx(), palette=PAL)
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError):
        decode_bmp(good[:30])
    # hostile dims
    huge = bytearray(good)
    huge[18:22] = struct.pack("<i", 1 << 24)
    with pytest.raises(ValueError, match="limit"):
        decode_bmp(bytes(huge))
    # palette index beyond a shortened palette: encoder guard, and a
    # decoder stream whose palette was truncated after the fact
    with pytest.raises(ValueError, match="palette index"):
        encode_bmp(_idx(), palette=PAL[:8])
    trunc_pal = bytearray(good)
    trunc_pal[46:50] = struct.pack("<I", 8)  # biClrUsed = 8 entries
    with pytest.raises(ValueError, match="palette index"):
        decode_bmp(bytes(trunc_pal))
    # RLE run overrunning its row
    with pytest.raises(ValueError, match="overruns"):
        rle8_decode(bytes([200, 1, 0, 1]), 10, 1)
    with pytest.raises(ValueError, match="truncated"):
        rle8_decode(bytes([0, 4, 9]), 4, 1)
    # unsupported depths are explicit (1/4/8/16/24/32 all decode now;
    # a spec-illegal depth stays a clean guard)
    bad_bpp = bytearray(good)
    bad_bpp[28:30] = struct.pack("<H", 2)
    with pytest.raises(NotImplementedError, match="2-bit"):
        decode_bmp(bytes(bad_bpp))
    # BI_BITFIELDS (comp=3) on 16-bit is the remaining honest guard
    bf = bytearray(good)
    bf[28:30] = struct.pack("<H", 16)
    bf[30:34] = struct.pack("<I", 3)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(bf))


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        decode_bmp(b"BM" + data)
    except (ValueError, NotImplementedError):
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-contract escape: {type(exc)}") from exc


def test_decode_image_routes_bmp():
    from health_monitor_cc_flink_spark.operators.multimodal import decode_image

    rgb = _rgb()
    assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)


def test_ico_container_roundtrip_and_hostiles():
    """ICO: DIB member with AND-mask alpha + PNG member; corrupt
    containers raise ValueError."""
    from health_monitor_cc_flink_spark.operators.bmp import (
        decode_ico,
        encode_ico,
    )
    from health_monitor_cc_flink_spark.operators.multimodal import encode_png

    y, x = np.mgrid[0:16, 0:16]
    idx = ((x + y) % 16).astype(np.uint8)
    trans = (x + y) % 5 == 0
    png_img = ((7 * x + 3 * y) % 256).astype(np.uint8)
    ico = encode_ico([("bmp", (idx, PAL, trans)), ("png", encode_png(png_img))])
    (k0, rgba), (k1, img1) = decode_ico(ico)
    assert k0 == "bmp" and rgba.shape == (16, 16, 4)
    assert np.array_equal(rgba[:, :, :3], PAL[idx])
    assert np.array_equal(rgba[:, :, 3], np.where(trans, 0, 255))
    assert k1 == "png" and np.array_equal(img1, png_img)
    # hostiles
    with pytest.raises(ValueError, match="ICONDIR"):
        decode_ico(b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated|out of bounds"):
        decode_ico(ico[:30])
    trunc = bytearray(ico)
    # member 0 size points past the end
    trunc[14:18] = struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError):
        decode_ico(bytes(trunc))
    with pytest.raises(ValueError, match="member count"):
        decode_ico(struct.pack("<HHH", 0, 1, 0))


def test_sub_byte_bmp_roundtrip():
    """1-bit and 4-bit paletted BMPs: MSB-first packed indices, 32-bit
    row padding, both row orders, ragged widths."""
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    y, x = np.mgrid[0:13, 0:11]
    idx4 = ((x + y) % 16).astype(np.uint8)
    idx1 = ((x + y) % 2).astype(np.uint8)
    for td in (False, True):
        got4 = decode_bmp(encode_bmp(idx4, palette=PAL,
                                     bits_per_pixel=4, top_down=td))
        assert np.array_equal(got4, PAL[idx4])
        got1 = decode_bmp(encode_bmp(idx1, palette=pal2,
                                     bits_per_pixel=1, top_down=td))
        assert np.array_equal(got1, pal2[idx1])
    for w in (1, 2, 3, 7, 9):
        i4 = idx4[:, :w]
        assert np.array_equal(
            decode_bmp(encode_bmp(i4, palette=PAL, bits_per_pixel=4)),
            PAL[i4],
        )
    with pytest.raises(ValueError, match="out of range"):
        encode_bmp(idx4, palette=PAL, bits_per_pixel=1)
    with pytest.raises(ValueError, match="RLE8"):
        encode_bmp(idx4, palette=PAL, bits_per_pixel=4, compression=1)


def test_32bit_bgra_roundtrip():
    """32-bit BGRA: alpha preserved, both row orders, word-aligned rows."""
    y, x = np.mgrid[0:9, 0:7]
    rgba = np.stack(
        [(3 * x) % 256, (5 * y) % 256, (x * y) % 256, (x + y) % 256],
        axis=2,
    ).astype(np.uint8)
    for td in (False, True):
        got = decode_bmp(encode_bmp(rgba, top_down=td))
        assert got.shape == (9, 7, 4) and np.array_equal(got, rgba)


def test_16bit_xrgb1555_decode():
    """16-bit BI_RGB (XRGB1555): 5-bit channels replicated to 8 bits,
    little-endian pixels, rows padded to 32 bits, bottom-up."""
    y, x = np.mgrid[0:2, 0:3]
    r5, g5, b5 = (x * 7) % 32, (y * 11) % 32, (x + y) % 32
    v = (r5 << 10) | (g5 << 5) | b5
    stride = (3 * 2 + 3) & ~3
    pix = bytearray()
    for row in v[::-1]:
        rb = b"".join(struct.pack("<H", int(val)) for val in row)
        pix += rb.ljust(stride, b"\x00")
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 16, 0, len(pix),
                       2835, 2835, 0, 0)
    img = decode_bmp(hdr + info + bytes(pix))
    rep = lambda c: ((c << 3) | (c >> 2)).astype(np.uint8)  # noqa: E731
    want = np.stack([rep(r5.astype(np.uint8)), rep(g5.astype(np.uint8)),
                     rep(b5.astype(np.uint8))], axis=2)
    assert np.array_equal(img, want)


def test_rle4_roundtrip_and_vectors():
    from health_monitor_cc_flink_spark.operators.bmp import (
        decode_bmp,
        encode_bmp,
        rle4_decode,
    )

    rng = np.random.default_rng(3)
    for h, w in ((7, 13), (16, 16), (3, 1), (9, 31)):
        idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
        idx[2:4] = 7  # constant-run rows exercise encoded runs
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        bmp = encode_bmp(idx, palette=pal, compression=2, bits_per_pixel=4)
        assert np.array_equal(decode_bmp(bmp), pal[idx]), (h, w)
    # hand-built stream: absolute run (5 nibbles, word-padded),
    # encoded run, delta, end-of-bitmap
    stream = bytes([
        0x00, 0x05, 0x12, 0x34, 0x50, 0x00,  # absolute 1,2,3,4,5 + pad
        0x02, 0xAB,                          # encoded 2: A,B
        0x00, 0x02, 0x01, 0x01,              # delta +1,+1
        0x00, 0x01,                          # end of bitmap
    ])
    out = rle4_decode(stream, 8, 2)
    assert list(out[0]) == [1, 2, 3, 4, 5, 0xA, 0xB, 0]
    assert list(out[1]) == [0] * 8
    # end-of-line resets x; alternating-nibble run
    out = rle4_decode(bytes([0x03, 0x77, 0x00, 0x00,
                             0x05, 0x21, 0x00, 0x01]), 6, 2)
    assert list(out[0]) == [7, 7, 7, 0, 0, 0]
    assert list(out[1]) == [2, 1, 2, 1, 2, 0]
    with pytest.raises(ValueError, match="truncated"):
        rle4_decode(bytes([0x00, 0x09, 0x11]), 16, 2)
    with pytest.raises(ValueError, match="overruns"):
        rle4_decode(bytes([0x09, 0x11]), 4, 1)
    with pytest.raises(NotImplementedError, match="RLE4"):
        # RLE4 compression on an 8-bit header is spec-invalid
        bad = bytearray(encode_bmp(np.zeros((4, 4), np.uint8),
                                   palette=np.zeros((2, 3), np.uint8)))
        bad[30:34] = (2).to_bytes(4, "little")
        decode_bmp(bytes(bad))


def test_16bit_encode_roundtrip():
    from health_monitor_cc_flink_spark.operators.bmp import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(rgb, bits_per_pixel=16))
    q = rgb >> 3
    assert np.array_equal(out, ((q << 3) | (q >> 2)).astype(np.uint8))
