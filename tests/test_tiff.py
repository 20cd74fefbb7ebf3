"""Baseline TIFF codec pins (operators/tiff.py, TIFF 6.0)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    parse_tiff_ifd,
)


def _gray(h=23, w=17):
    y, x = np.mgrid[0:h, 0:w]
    return ((x + 2 * y) % 256).astype(np.uint8)


def _rgb(h=23, w=17):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(3 * x) % 256, (5 * y) % 256, (x + y) % 256],
                    axis=2).astype(np.uint8)


def test_roundtrip_matrix():
    """Both byte orders x all three compressions x strip layouts x
    gray/RGB round-trip bit-exactly."""
    for bo in ("II", "MM"):
        for comp in (1, 5, 32773):
            for rps in (None, 1, 4, 7):
                for img in (_gray(), _rgb()):
                    out = decode_tiff(encode_tiff(img, bo, comp, rps))
                    assert np.array_equal(out, img), (bo, comp, rps, img.ndim)


def test_min_is_white_inverted():
    g = _gray()
    assert np.array_equal(decode_tiff(encode_tiff(g, photometric=0)), g)


def test_ifd_metadata_surface():
    t = encode_tiff(_rgb(), "MM", 32773, 4, software="synthco scan v1")
    order, tags = parse_tiff_ifd(t)
    assert order == "MM"
    assert tags[256] == [17] and tags[257] == [23]
    assert tags[259] == [32773] and tags[277] == [3]
    assert tags[258] == [8, 8, 8]
    assert tags[305] == ["synthco scan v1"]
    assert len(tags[273]) == len(tags[279]) == 6  # ceil(23/4) strips


def test_packbits_adversarial():
    # spec vectors: repeats, literals, no-op
    assert packbits_decode(b"\xfe\xaa", 100) == b"\xaa\xaa\xaa"
    assert packbits_decode(b"\x02abc", 100) == b"abc"
    assert packbits_decode(b"\x80\x00a", 100) == b"a"  # no-op then literal
    with pytest.raises(ValueError, match="cap"):
        packbits_decode(b"\x81\xff" * 100, 50)  # bomb hits the cap
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab", 100)
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\xfe", 100)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_packbits_roundtrip_fuzz(data):
    assert packbits_decode(packbits_encode(data), len(data) + 1) == data


def test_corrupt_payloads_flag_cleanly():
    good = encode_tiff(_gray(), "II", 32773, 4)
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II" + struct.pack("<HI", 41, 8) + good[8:])
    with pytest.raises(ValueError):
        decode_tiff(good[:40])  # truncated before the IFD
    # hostile dims: IFD claims a huge image over 4 bytes of strip data
    order, tags = parse_tiff_ifd(good)
    # patch ImageWidth inside the IFD to an enormous value
    ifd_off = struct.unpack("<I", good[4:8])[0]
    patched = bytearray(good)
    n = struct.unpack("<H", good[ifd_off:ifd_off + 2])[0]
    for e in range(n):
        base = ifd_off + 2 + 12 * e
        tag = struct.unpack("<H", good[base:base + 2])[0]
        if tag == 256:
            patched[base + 8:base + 12] = struct.pack("<I", 1 << 30)
    with pytest.raises(ValueError, match="limit|strip"):
        decode_tiff(bytes(patched))


def test_unsupported_subsets_explicit():
    good = bytearray(encode_tiff(_gray()))
    ifd_off = struct.unpack("<I", good[4:8])[0]
    n = struct.unpack("<H", good[ifd_off:ifd_off + 2])[0]
    for e in range(n):
        base = ifd_off + 2 + 12 * e
        tag = struct.unpack("<H", bytes(good[base:base + 2]))[0]
        if tag == 259:  # Compression -> old-style JPEG (6): unsupported
            j6 = good.copy()
            j6[base + 8:base + 12] = struct.pack("<I", 6)
            with pytest.raises(NotImplementedError, match="compression"):
                decode_tiff(bytes(j6))
        if tag == 258:  # BitsPerSample -> 12: honestly unsupported
            b12 = good.copy()
            b12[base + 8:base + 12] = struct.pack("<I", 12)
            with pytest.raises(NotImplementedError, match="bits"):
                decode_tiff(bytes(b12))


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    for prefix in (b"II*\x00", b"MM\x00*"):
        try:
            decode_tiff(prefix + data)
        except (ValueError, NotImplementedError):
            pass
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"non-contract escape: {type(exc)}") from exc


def test_decode_image_routes_tiff():
    from health_monitor_cc_flink_spark.operators.multimodal import decode_image

    g = _gray()
    assert np.array_equal(decode_image(encode_tiff(g, "MM", 32773, 4)), g)


def test_exif_roundtrip_and_jpeg_integration():
    """EXIF APP1: build -> splice into a JPEG -> extract -> parse, both
    byte orders; no-EXIF images report None; corrupt APP1 raises."""
    from health_monitor_cc_flink_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        extract_exif_app1,
        insert_app1,
    )
    from health_monitor_cc_flink_spark.operators.tiff import (
        build_exif_app1,
        parse_exif,
    )

    img = np.full((16, 16), 84, np.uint8)  # flat even: lossless roundtrip
    plain = encode_jpeg_gray(img)
    assert extract_exif_app1(plain) is None
    for bo in ("II", "MM"):
        app1 = build_exif_app1("SynthCo", "ScanCam 9", 6,
                               "2026:01:02 03:04:05", 400, 16, 16, bo)
        jb = insert_app1(plain, app1)
        # the image still decodes; the APP1 comes back byte-identical
        assert np.array_equal(decode_jpeg_gray(jb), img)
        got = extract_exif_app1(jb)
        assert got == app1
        meta = parse_exif(got)
        assert meta["Make"] == ["SynthCo"]
        assert meta["Model"] == ["ScanCam 9"]
        assert meta["Orientation"] == [6]
        assert meta["DateTimeOriginal"] == ["2026:01:02 03:04:05"]
        assert meta["ISOSpeedRatings"] == [400]
        assert meta["PixelXDimension"] == [16]
        assert meta["PixelYDimension"] == [16]
    with pytest.raises(ValueError, match="EXIF"):
        parse_exif(b"JFIF\x00\x00junk")
    with pytest.raises(ValueError):
        parse_exif(b"Exif\x00\x00II\x2a\x00\xff\xff\xff\xff")


def test_lzw_unit_vectors_and_hostiles():
    """TIFF LZW: width-boundary crossings (9->10->11->12), table-full
    Clear cycles, KwKwK pattern, and hostile streams."""
    import numpy as np

    from health_monitor_cc_flink_spark.operators.tiff import (
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.RandomState(3)
    # enough distinct phrases to cross every width boundary + a Clear
    big = rng.randint(0, 256, 60000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(big), len(big) + 1) == big
    # KwKwK: aaa... makes the decoder hit code == len(table)
    runs = b"a" * 500
    assert lzw_decode(lzw_encode(runs), 501) == runs
    assert lzw_decode(lzw_encode(b""), 1) == b""
    with pytest.raises(ValueError, match="cap"):
        lzw_decode(lzw_encode(big), 100)
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(lzw_encode(big)[:-8], len(big) + 1)
    # a stream that opens with a table code is corrupt
    with pytest.raises(ValueError, match="table code"):
        # 9-bit code 300 followed by EOI, MSB-packed by hand
        acc = (300 << 9) | 257
        lzw_decode(bytes([(acc >> 10) & 0xFF, (acc >> 2) & 0xFF,
                          (acc << 6) & 0xFF]), 100)


def test_predictor2_roundtrip_and_tag():
    """Predictor 2 (horizontal differencing): round-trips with LZW and
    PackBits, writes tag 317, shrinks LZW output on smooth content."""
    from health_monitor_cc_flink_spark.operators.tiff import (
        decode_tiff as _dec,
        encode_tiff as _enc,
        parse_tiff_ifd as _ifd,
    )

    for comp in (5, 32773):
        for img in (_gray(), _rgb()):
            t = _enc(img, "MM", comp, 4, predictor=2)
            assert np.array_equal(_dec(t), img), comp
            assert _ifd(t)[1][317] == [2]
    smooth = _gray(64, 64)
    assert len(_enc(smooth, "II", 5, predictor=2)) < len(_enc(smooth, "II", 5))
    with pytest.raises(ValueError, match="predictor"):
        _enc(smooth, "II", 1, predictor=2)
    # unsupported predictor value on decode is explicit
    t = bytearray(_enc(smooth, "II", 5, predictor=2))
    ifd_off = struct.unpack("<I", t[4:8])[0]
    n = struct.unpack("<H", t[ifd_off:ifd_off + 2])[0]
    for e in range(n):
        base = ifd_off + 2 + 12 * e
        if struct.unpack("<H", bytes(t[base:base + 2]))[0] == 317:
            t[base + 8:base + 12] = struct.pack("<I", 3)
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_tiff(bytes(t))


def test_multipage_chain_roundtrip_and_hostiles():
    """Next-IFD chain: N pages round-trip in order; decode_tiff reads
    page 0; cycles and truncation flag cleanly."""
    from health_monitor_cc_flink_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff_multipage,
        parse_tiff_pages,
    )

    pages = [_gray(), _rgb(), 255 - _gray()]
    for bo in ("II", "MM"):
        for comp, pred in ((1, 1), (5, 2), (32773, 1)):
            t = encode_tiff_multipage(pages, bo, comp, 4, predictor=pred)
            got = decode_tiff_pages(t)
            assert len(got) == 3
            for a, b in zip(got, pages):
                assert np.array_equal(a, b), (bo, comp)
            assert np.array_equal(decode_tiff(t), pages[0])
            order, tag_pages = parse_tiff_pages(t)
            assert order == bo and len(tag_pages) == 3
    # a chain cycle must be detected, not spin
    t = bytearray(encode_tiff_multipage([_gray(), _gray()], "II"))
    ifd0 = struct.unpack("<I", t[4:8])[0]
    n = struct.unpack("<H", t[ifd0:ifd0 + 2])[0]
    ptr = ifd0 + 2 + 12 * n
    t[ptr:ptr + 4] = struct.pack("<I", ifd0)  # page 0 -> page 0
    with pytest.raises(ValueError, match="cycle"):
        decode_tiff_pages(bytes(t))
    with pytest.raises(ValueError):
        decode_tiff_pages(encode_tiff_multipage([_gray()], "II")[:40])

# ---------------------------------------------------------------------------
# round-10 extensions: 16-bit samples, tiled layout, JPEG-in-TIFF (comp 7)
# ---------------------------------------------------------------------------


def _flat_blocks(h, w, d):
    """Flat even-valued 8x8 blocks — DC round-trips exactly through
    the JPEG path (same family as the mm_jpeg* oracle queries)."""
    by, bx = np.mgrid[0:h // 8, 0:w // 8]
    v = (2 * ((d + 59 * by + 31 * bx) % 128)).astype(np.uint8)
    return np.kron(v, np.ones((8, 8), dtype=np.uint8))


def test_16bit_roundtrip_matrix():
    rng = np.random.default_rng(7)
    for bo in ("II", "MM"):
        for comp, pred in ((1, 1), (5, 2), (32773, 1), (5, 1)):
            img = rng.integers(0, 65536, (23, 37), dtype=np.uint16)
            out = decode_tiff(encode_tiff(img, bo, comp, 7, predictor=pred))
            assert out.dtype == np.uint16 and np.array_equal(out, img)
    rgb = rng.integers(0, 65536, (17, 21, 3), dtype=np.uint16)
    for bo in ("II", "MM"):
        assert np.array_equal(decode_tiff(encode_tiff(rgb, bo, 32773, 4)), rgb)
    # MinIsWhite inverts over the 16-bit range
    img = rng.integers(0, 65536, (9, 11), dtype=np.uint16)
    assert np.array_equal(decode_tiff(encode_tiff(img, "II", 1, photometric=0)), img)


def test_tiled_layout_roundtrip_and_edge_crop():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)  # non-multiple dims
    assert np.array_equal(
        decode_tiff(encode_tiff(img, "MM", 5, predictor=2, tile=(16, 16))), img
    )
    rgb = rng.integers(0, 256, (20, 45, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(rgb, "II", 1, tile=(32, 16))), rgb)
    g16 = rng.integers(0, 65536, (31, 18), dtype=np.uint16)
    assert np.array_equal(decode_tiff(encode_tiff(g16, "MM", 32773, tile=(16, 32))), g16)
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, "II", 1, tile=(8, 8))


def test_jpeg_in_tiff_gray_strip_tile_tables():
    img = _flat_blocks(32, 48, 5)
    assert np.array_equal(decode_tiff(encode_tiff(img, "II", 7)), img)
    # multi-strip, abbreviated streams against tag-347 JPEGTables
    t = encode_tiff(img, "MM", 7, rows_per_strip=16, jpeg_tables=True)
    _, tags = parse_tiff_ifd(t)
    assert 347 in tags and len(tags[273]) == 2
    assert np.array_equal(decode_tiff(t), img)
    t = encode_tiff(img, "II", 7, tile=(16, 16), jpeg_tables=True)
    _, tags = parse_tiff_ifd(t)
    assert 347 in tags and 322 in tags
    assert np.array_equal(decode_tiff(t), img)


def test_jpeg_in_tiff_color_photometric6():
    g = _flat_blocks(32, 32, 9)
    rgb = np.stack([g, g, g], axis=2)  # Cb=Cr=128 -> DC-exact roundtrip
    t = encode_tiff(rgb, "II", 7)
    _, tags = parse_tiff_ifd(t)
    assert tags[262] == [6] and tags[530] == [1, 1]
    assert np.array_equal(decode_tiff(t), rgb)
    t = encode_tiff(rgb, "MM", 7, rows_per_strip=16, jpeg_tables=True)
    assert np.array_equal(decode_tiff(t), rgb)


def test_multipage_16bit_tiled_chain():
    from health_monitor_cc_flink_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff_multipage,
    )

    rng = np.random.default_rng(13)
    pages = [rng.integers(0, 65536, (19, 22), dtype=np.uint16) for _ in range(3)]
    t = encode_tiff_multipage(pages, "MM", 5, predictor=2, tile=(16, 16))
    outs = decode_tiff_pages(t)
    assert len(outs) == 3
    assert all(np.array_equal(a, b) for a, b in zip(outs, pages))


def test_jpeg_in_tiff_guards():
    img16 = np.zeros((16, 16), dtype=np.uint16)
    with pytest.raises(ValueError, match="8-bit"):
        encode_tiff(img16, "II", 7)
    img = _flat_blocks(16, 16, 1)
    with pytest.raises(ValueError, match="predictor 2"):
        encode_tiff(img, "II", 7, predictor=2)
    with pytest.raises(ValueError, match="jpeg_tables"):
        encode_tiff(img, "II", 5, jpeg_tables=True)


def test_exif_gps_ifd_roundtrip():
    from health_monitor_cc_flink_spark.operators.tiff import (
        build_exif_app1,
        exif_gps_decimal,
        parse_exif,
    )

    for bo in ("II", "MM"):
        app1 = build_exif_app1(
            "SynthCo", "GeoCam 1", 1, "2026:01:02 03:04:05", 200,
            32, 32, bo,
            gps=("N", [(48, 1), (51, 1), (2412, 100)],
                 "E", [(2, 1), (21, 1), (350, 100)]),
        )
        meta = parse_exif(app1)
        assert meta["GPSLatitude"] == [(48, 1), (51, 1), (2412, 100)]
        lat, lon = exif_gps_decimal(meta)
        assert abs(lat - (48 + 51 / 60 + 24.12 / 3600)) < 1e-12
        assert abs(lon - (2 + 21 / 60 + 3.50 / 3600)) < 1e-12
        # S/W refs negate; GPS-less payloads return None
        s = build_exif_app1("a", "b", 1, "d", 1, 1, 1, bo,
                            gps=("S", [(10, 1), (0, 1), (0, 1)],
                                 "W", [(20, 1), (30, 1), (0, 1)]))
        lat, lon = exif_gps_decimal(parse_exif(s))
        assert lat == -10.0 and abs(lon + 20.5) < 1e-12
        plain = build_exif_app1("a", "b", 1, "d", 1, 1, 1, bo)
        assert exif_gps_decimal(parse_exif(plain)) is None
        assert "Make" in parse_exif(plain)  # base fields unaffected
