"""Baseline JPEG codec pins (operators/jpeg.py, pure numpy, T.81).

Three layers: (1) the entropy layer is LOSSLESS on quantized
coefficients — exact roundtrips over adversarial coefficient patterns
(ZRL runs, EOB, byte stuffing, DC prediction); (2) flat-8x8-block
images with even values roundtrip PIXEL-exact through the full lossy
path (DC = 8(v-128) divides the Annex K DC quantizer 16 exactly, all
AC vanish) — the property the hash-gated registry oracle is built on;
(3) natural images roundtrip within the expected quantization error.
"""

import numpy as np
import pytest

from health_monitor_cc_flink_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    STD_LUMA_QUANT,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg_coeffs,
    decode_jpeg_gray,
    encode_jpeg_from_qcoeffs,
    encode_jpeg_gray,
    quantized_coeffs,
)


def flat_block_image(rng, bh, bw):
    """Image of flat 8x8 blocks with EVEN values — lossless by design."""
    v = 2 * rng.integers(0, 128, size=(bh, bw), dtype=np.int64)
    return np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_zigzag_is_the_standard_order():
    # spot-check the canonical prefix and full permutation properties
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_annex_k_tables_are_valid_canonical_huffman():
    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(dc) == 12 and len(ac) == 162
    # canonical codes are prefix-free by construction; verify it
    # explicitly per table as a belt-and-braces check
    for table in (dc, ac):
        codes = sorted(format(c, f"0{ln}b") for c, ln in table.values())
        for a, b in zip(codes, codes[1:]):
            assert a != b and not b.startswith(a)


def test_flat_block_image_roundtrips_pixel_exact():
    rng = np.random.default_rng(7)
    for bh, bw in [(1, 1), (2, 3), (16, 16), (5, 13)]:
        img = flat_block_image(rng, bh, bw)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        np.testing.assert_array_equal(out, img)


def test_flat_blocks_have_dc_only_coefficients():
    rng = np.random.default_rng(11)
    img = flat_block_image(rng, 4, 4)
    qc = quantized_coeffs(img)
    assert np.all(qc.reshape(-1, 64)[:, 1:] == 0)
    np.testing.assert_array_equal(
        qc[:, 0, 0], (img[0::8, 0::8].astype(np.int64).reshape(-1) - 128) // 2
    )


def test_coefficient_space_roundtrip_exact():
    """Entropy layer is lossless: random coefficient fields with long
    zero runs (forces ZRL), dense tails (forces no-EOB blocks), and
    values crafted to emit 0xFF bytes (forces stuffing) all recover
    bit-for-bit."""
    rng = np.random.default_rng(42)
    for trial in range(8):
        nb = int(rng.integers(1, 30))
        qc = np.zeros((nb, 64), dtype=np.int64)
        qc[:, 0] = rng.integers(-1000, 1000, nb)
        # sparse AC with heavy zero runs
        for b in range(nb):
            for _ in range(int(rng.integers(0, 12))):
                qc[b, int(rng.integers(1, 64))] = int(rng.integers(-255, 256)) or 1
        # one fully dense block exercises the no-EOB path
        qc[0, :] = rng.integers(1, 10, 64)
        w, h = nb * 8, 8  # a (1, nb) block grid
        payload = encode_jpeg_from_qcoeffs(qc.reshape(nb, 8, 8), w, h)
        got, quant, gw, gh = decode_jpeg_coeffs(payload)
        assert (gw, gh) == (w, h)
        np.testing.assert_array_equal(got.reshape(nb, 64), qc)
        np.testing.assert_array_equal(quant, STD_LUMA_QUANT)


def test_natural_image_roundtrip_within_quant_error():
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:64, 0:64]
    img = (
        128
        + 80 * np.sin(x / 9.0)
        + 40 * np.cos(y / 5.0)
        + rng.normal(0, 4, (64, 64))
    )
    img = np.clip(img, 0, 255).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == img.shape
    rmse = float(np.sqrt(np.mean((out.astype(float) - img.astype(float)) ** 2)))
    assert rmse < 12.0, rmse  # Annex K table at "quality 50" on smooth content


def test_odd_dims_pad_and_crop():
    rng = np.random.default_rng(5)
    img = flat_block_image(rng, 3, 3)[:19, :21]  # 19x21, not multiples of 8
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == img.shape
    # edge-replicate padding keeps padded blocks flat only where the
    # crop boundary falls inside a block; interior pixels stay exact
    np.testing.assert_array_equal(out[:16, :16], img[:16, :16])


def test_corrupt_payloads_raise_value_error():
    rng = np.random.default_rng(9)
    payload = encode_jpeg_gray(flat_block_image(rng, 2, 2))
    with pytest.raises(ValueError):
        decode_jpeg_gray(payload[:40])  # truncated mid-header
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01" + payload[2:])  # no SOI
    # short segment BODIES must be ValueError, never IndexError
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xc0\x00\x02\xff\xd9")  # empty SOF0
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02\xff\xd9")  # short DHT
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xda\x00\x03\x01\xff\xd9")  # short SOS
    # T.81 zero-height (DNL-deferred) is flagged, not crashed on
    sof = payload.index(b"\xff\xc0")
    zero_h = bytearray(payload)
    zero_h[sof + 5 : sof + 7] = b"\x00\x00"
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(zero_h))
    broken = bytearray(payload)
    broken[-20] ^= 0xA5  # flip a byte inside the entropy stream
    try:
        out = decode_jpeg_gray(bytes(broken))
        # a flipped bit may still decode to SOME image; it must at
        # least not crash with anything other than ValueError
        assert out.shape == (16, 16)
    except ValueError:
        pass


def test_unsupported_variants_raise_not_implemented():
    rng = np.random.default_rng(13)
    payload = bytearray(encode_jpeg_gray(flat_block_image(rng, 1, 1)))
    sof = payload.index(b"\xff\xc0")
    # SOF1 (extended sequential) is SUPPORTED since round 9: an 8-bit
    # baseline stream relabeled SOF1 decodes identically
    extended = payload.copy()
    extended[sof + 1] = 0xC1
    np.testing.assert_array_equal(
        decode_jpeg_gray(bytes(extended)), decode_jpeg_gray(bytes(payload))
    )
    # progressive is SUPPORTED since round 8 — but a baseline stream
    # relabeled SOF2 carries an Ss=0,Se=63 scan, illegal in progressive
    relabeled = payload.copy()
    relabeled[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(relabeled))
    multi = payload.copy()
    multi[sof + 9] = 2  # 2-component frames stay unsupported (1 or 3 only)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(bytes(multi))


def test_decoder_reads_tables_from_file_not_constants():
    """A non-standard quant table must flow through decode (tables are
    read from DQT, not assumed)."""
    rng = np.random.default_rng(21)
    img = flat_block_image(rng, 2, 2)
    quant = np.full((8, 8), 8, dtype=np.int64)
    quant[0, 0] = 4  # DC step 4 still divides 8*(v-128) for even v
    out = decode_jpeg_gray(encode_jpeg_gray(img, quant))
    np.testing.assert_array_equal(out, img)


# ---------------------------------------------------------------------------
# Property-based fuzz: the decoder's failure contract must hold for ANY
# byte string — ValueError/NotImplementedError only, never IndexError/
# RecursionError/MemoryError — and the two lossless layers must
# roundtrip for arbitrary valid inputs.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_fuzz_arbitrary_bytes_fail_cleanly(data):
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg_gray(b"\xff\xd8" + data)


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_fuzz_truncations_and_bitflips_fail_cleanly_or_decode(data):
    rng = np.random.default_rng(77)
    payload = bytearray(encode_jpeg_gray(flat_block_image(rng, 2, 2)))
    mode = data.draw(st.sampled_from(["truncate", "flip"]))
    if mode == "truncate":
        cut = data.draw(st.integers(0, len(payload) - 1))
        corrupted = bytes(payload[:cut])
    else:
        pos = data.draw(st.integers(2, len(payload) - 1))
        payload[pos] ^= data.draw(st.integers(1, 255))
        corrupted = bytes(payload)
    try:
        out = decode_jpeg_gray(corrupted)
        assert out.dtype == np.uint8  # a salvageable flip may still decode
    except (ValueError, NotImplementedError):
        pass  # the documented failure contract — and nothing else


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_fuzz_flat_block_roundtrip(data):
    bh = data.draw(st.integers(1, 6))
    bw = data.draw(st.integers(1, 6))
    v = np.array(
        data.draw(
            st.lists(
                st.integers(0, 127), min_size=bh * bw, max_size=bh * bw
            )
        ),
        dtype=np.int64,
    ).reshape(bh, bw) * 2
    img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
    np.testing.assert_array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_fuzz_coefficient_entropy_roundtrip(data):
    nb = data.draw(st.integers(1, 8))
    qc = np.zeros((nb, 64), dtype=np.int64)
    for b in range(nb):
        qc[b, 0] = data.draw(st.integers(-900, 900))
        for _ in range(data.draw(st.integers(0, 10))):
            k = data.draw(st.integers(1, 63))
            qc[b, k] = data.draw(
                st.integers(-255, 255).filter(lambda x: x != 0)
            )
    got, _, _, _ = decode_jpeg_coeffs(
        encode_jpeg_from_qcoeffs(qc.reshape(nb, 8, 8), nb * 8, 8)
    )
    np.testing.assert_array_equal(got.reshape(nb, 64), qc)


# ---------------------------------------------------------------------------
# Color (YCbCr 4:4:4 / 4:2:0, MCU-interleaved)
# ---------------------------------------------------------------------------

from health_monitor_cc_flink_spark.operators.jpeg import (  # noqa: E402
    STD_CHROMA_QUANT,
    decode_jpeg,
    decode_jpeg_planes,
    decode_jpeg_rgb,
    encode_jpeg_rgb,
    encode_jpeg_ycbcr,
)


def test_color_444_flat_planes_roundtrip_exact():
    rng = np.random.default_rng(51)
    y, cb, cr = (flat_block_image(rng, 2, 3) for _ in range(3))
    # luma quant table for chroma too: DC step 16 divides 8*(v-128)
    payload = encode_jpeg_ycbcr(y, cb, cr, "444", quant_chroma=STD_LUMA_QUANT)
    planes, w, h = decode_jpeg_planes(payload)
    assert (w, h) == (24, 16) and len(planes) == 3
    for a, b in zip((y, cb, cr), planes):
        np.testing.assert_array_equal(a, b)


def test_color_420_flat_planes_roundtrip_exact():
    """4:2:0 exercises the 2x2-luma MCU geometry and per-component DC
    predictors: half-size chroma planes must come back exactly."""
    rng = np.random.default_rng(53)
    y = flat_block_image(rng, 4, 6)          # 32x48
    cb = flat_block_image(rng, 2, 3)         # 16x24
    cr = flat_block_image(rng, 2, 3)
    payload = encode_jpeg_ycbcr(y, cb, cr, "420", quant_chroma=STD_LUMA_QUANT)
    planes, w, h = decode_jpeg_planes(payload)
    assert (w, h) == (48, 32)
    assert planes[1].shape == (16, 24) and planes[2].shape == (16, 24)
    for a, b in zip((y, cb, cr), planes):
        np.testing.assert_array_equal(a, b)


def test_color_rgb_roundtrip_within_quant_error():
    rng = np.random.default_rng(57)
    y, x = np.mgrid[0:48, 0:48]
    img = np.stack(
        [
            128 + 70 * np.sin(x / 8.0),
            128 + 50 * np.cos(y / 6.0),
            np.full_like(x, 90.0, dtype=np.float64),
        ],
        axis=2,
    )
    img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg_rgb(encode_jpeg_rgb(img, sub))
        assert out.shape == img.shape
        rmse = float(np.sqrt(np.mean((out.astype(float) - img.astype(float)) ** 2)))
        assert rmse < 14.0, (sub, rmse)


def test_color_odd_dims_and_dispatch():
    rng = np.random.default_rng(59)
    img = np.clip(
        rng.normal(128, 30, (19, 21, 3)), 0, 255
    ).astype(np.uint8)  # neither dim a multiple of 8 or 16
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg_rgb(img, sub))
        assert out.shape == (19, 21, 3)
    gray = decode_jpeg(encode_jpeg_gray(flat_block_image(rng, 1, 1)))
    assert gray.ndim == 2


def test_color_unsupported_features_still_raise():
    """Every T.81-legal sampling layout now decodes (444/422/420/440/
    411 covered elsewhere); the honest NotImplementedError surface is
    down to 12-bit precision and arithmetic coding."""
    rng = np.random.default_rng(61)
    payload = bytearray(
        encode_jpeg_ycbcr(*(flat_block_image(rng, 2, 2) for _ in range(3)), "444")
    )
    sof = payload.index(b"\xff\xc0")
    # 12-bit on SOF0 is spec-INVALID (baseline is 8-bit by definition);
    # an unsupported precision on SOF1 is the honest NotImplementedError
    twelve_bit = bytearray(payload)
    twelve_bit[sof + 4] = 12  # precision byte
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(twelve_bit))
    ten_bit = bytearray(payload)
    ten_bit[sof + 1] = 0xC1
    ten_bit[sof + 4] = 10
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(ten_bit))
    arith = bytearray(payload)
    arith[sof + 1] = 0xC9  # SOF9: arithmetic-coded sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(arith))


def test_gray_coeff_access_rejects_color():
    rng = np.random.default_rng(63)
    payload = encode_jpeg_ycbcr(*(flat_block_image(rng, 1, 1) for _ in range(3)), "444")
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(payload)
    with pytest.raises(NotImplementedError):
        decode_jpeg_coeffs(payload)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_color_headers_fail_cleanly(data):
    """Color frames widen the header surface (per-component selectors,
    MCU geometry): arbitrary tails after a real color header prefix
    must still fail with the documented exceptions only."""
    rng = np.random.default_rng(65)
    prefix = encode_jpeg_ycbcr(
        flat_block_image(rng, 2, 2),
        flat_block_image(rng, 1, 1),
        flat_block_image(rng, 1, 1),
        "420",
    )[:60]
    try:
        out = decode_jpeg(bytes(prefix) + data)
        assert out.ndim in (2, 3)
    except (ValueError, NotImplementedError):
        pass


def test_restart_markers_roundtrip_gray_and_color():
    """DRI + cycling RSTn: byte-aligned restart segments with DC
    predictor resets must roundtrip pixel-exact in both grayscale and
    interleaved color, including intervals that exercise the RST
    modulo-8 cycle (>8 restarts)."""
    rng = np.random.default_rng(71)
    img = flat_block_image(rng, 4, 5)  # 20 MCUs
    for ri in (1, 3, 7):
        payload = encode_jpeg_gray(img, restart_interval=ri)
        assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
        np.testing.assert_array_equal(decode_jpeg_gray(payload), img)
    y = flat_block_image(rng, 4, 6)
    cb, cr = flat_block_image(rng, 2, 3), flat_block_image(rng, 2, 3)
    payload = encode_jpeg_ycbcr(
        y, cb, cr, "420", quant_chroma=STD_LUMA_QUANT, restart_interval=1
    )
    planes, _, _ = decode_jpeg_planes(payload)
    for a, b in zip((y, cb, cr), planes):
        np.testing.assert_array_equal(a, b)


def test_restart_marker_abuse_fails_cleanly():
    rng = np.random.default_rng(73)
    payload = bytearray(encode_jpeg_gray(flat_block_image(rng, 2, 4), restart_interval=2))
    # out-of-sequence RST: flip D0 -> D3
    pos = payload.index(b"\xff\xd0")
    broken = payload.copy()
    broken[pos + 1] = 0xD3
    with pytest.raises(ValueError, match="sequence"):
        decode_jpeg_gray(bytes(broken))
    # RST markers without a DRI segment
    no_dri = bytearray(payload)
    dri = no_dri.index(b"\xff\xdd")
    del no_dri[dri : dri + 6]
    with pytest.raises(ValueError, match="DRI"):
        decode_jpeg_gray(bytes(no_dri))
    # truncated: drop the last restart segment entirely
    last = bytes(payload[: payload.index(b"\xff\xd0") + 2]) + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg_gray(last)


def test_hostile_color_dims_capped_per_component():
    """A 3-component 4:4:4 frame at exactly the old w*h cap must now be
    rejected: the guard bounds TOTAL coefficients across components."""
    rng = np.random.default_rng(67)
    payload = bytearray(
        encode_jpeg_ycbcr(*(flat_block_image(rng, 1, 1) for _ in range(3)), "444")
    )
    sof = payload.index(b"\xff\xc0")
    payload[sof + 5 : sof + 9] = (8192).to_bytes(2, "big") * 2  # 8192x8192x3
    with pytest.raises(ValueError, match="decoder limit"):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode + encode (round 8)
# ---------------------------------------------------------------------------

from health_monitor_cc_flink_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg_coeffs,
    decode_jpeg_rgb,
    encode_jpeg_progressive_gray,
    encode_jpeg_progressive_rgb,
    encode_jpeg_progressive_ycbcr,
    encode_jpeg_rgb,
)


def test_progressive_gray_coefficient_exact():
    """Progressive is an entropy reordering: decoded quantized
    coefficients must equal the baseline encoding's exactly."""
    rng = np.random.default_rng(81)
    for shape in [(7, 9), (16, 24), (33, 41), (64, 64)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        qc_b, _, _, _ = decode_jpeg_coeffs(encode_jpeg_gray(img))
        for ri in (0, 3):
            prog = encode_jpeg_progressive_gray(img, restart_interval=ri)
            qc_p, _, w, h = decode_jpeg_coeffs(prog)
            assert (w, h) == (shape[1], shape[0])
            np.testing.assert_array_equal(qc_p, qc_b)


def test_progressive_color_pixel_exact_vs_baseline():
    rng = np.random.default_rng(83)
    for shape in [(20, 20, 3), (33, 41, 3), (48, 64, 3)]:
        rgb = rng.integers(0, 256, shape).astype(np.uint8)
        for sub in ("444", "420"):
            np.testing.assert_array_equal(
                decode_jpeg_rgb(encode_jpeg_progressive_rgb(rgb, sub)),
                decode_jpeg_rgb(encode_jpeg_rgb(rgb, sub)),
            )


def test_progressive_restart_and_custom_script():
    rng = np.random.default_rng(85)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    qc_b, _, _, _ = decode_jpeg_coeffs(encode_jpeg_gray(img))
    # spectral-selection-only script (no successive approximation)
    scans = [([0], 0, 0, 0, 0), ([0], 1, 20, 0, 0), ([0], 21, 63, 0, 0)]
    qc_p, _, _, _ = decode_jpeg_coeffs(
        encode_jpeg_progressive_gray(img, scans=scans)
    )
    np.testing.assert_array_equal(qc_p, qc_b)
    # deep successive approximation, fine restart interval
    scans = [
        ([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1),
        ([0], 1, 63, 1, 0),
    ]
    qc_p, _, _, _ = decode_jpeg_coeffs(
        encode_jpeg_progressive_gray(img, scans=scans, restart_interval=1)
    )
    np.testing.assert_array_equal(qc_p, qc_b)


def test_progressive_sparse_ac_refine_stress():
    """Sparse high-frequency content maximizes ZRL/EOB-run/correction
    bit interplay in the AC refinement coder."""
    rng = np.random.default_rng(87)
    for _ in range(15):
        img = np.zeros((32, 32), dtype=np.uint8)
        idx = rng.integers(0, 32, (12, 2))
        img[idx[:, 0], idx[:, 1]] = rng.integers(1, 256, 12)
        qc_p, _, _, _ = decode_jpeg_coeffs(encode_jpeg_progressive_gray(img))
        qc_b, _, _, _ = decode_jpeg_coeffs(encode_jpeg_gray(img))
        np.testing.assert_array_equal(qc_p, qc_b)


def test_progressive_partial_scans_decode():
    """A truncated progressive scan sequence (DC-only) is a legal
    lower-quality image: the decoder must accept it and produce the
    DC approximation, not crash."""
    rng = np.random.default_rng(89)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    dc_only = encode_jpeg_progressive_gray(
        img, scans=[([0], 0, 0, 0, 0)]
    )
    out = decode_jpeg_gray(dc_only)
    assert out.shape == (24, 24)
    # DC-only blocks are flat at the block mean (quantized): every 8x8
    # block must be constant
    blocks = out.reshape(3, 8, 3, 8)
    assert (blocks == blocks[:, :1, :, :1]).all()


def test_progressive_malformed_scans_rejected():
    rng = np.random.default_rng(91)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    # interleaved AC scan is illegal
    with pytest.raises(ValueError):
        encode_jpeg_progressive_ycbcr(
            img, img, img, "444", scans=[([0, 1, 2], 1, 5, 0, 0)]
        )
    payload = bytearray(encode_jpeg_progressive_gray(img))
    # corrupt a scan's spectral band: Ss=0 scans must have Se=0
    sos = payload.index(b"\xff\xda")
    seglen = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    assert payload[sos + 2 + seglen - 3] == 0  # Ss of the DC scan
    broken = payload.copy()
    broken[sos + 2 + seglen - 2] = 13  # Se
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_gray(bytes(broken))
    # truncating entropy data mid-scan fails cleanly
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(payload[: len(payload) // 2]) + b"\xff\xd9")


def test_subsampling_422_411_440_planes_and_pixels():
    """The new chroma layouts decode with chroma at NATIVE resolution,
    flat even blocks are DC-exact, and progressive == baseline."""
    from health_monitor_cc_flink_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_planes,
        encode_jpeg_progressive_ycbcr,
        encode_jpeg_ycbcr,
    )

    w, h = 64, 32

    def blocks(bh, bw, a, b, c):
        by, bx = np.mgrid[0:bh, 0:bw]
        v = 2 * ((a * by + b * bx + c) % 128)
        return np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)

    for sub, hy, vy in (("422", 2, 1), ("411", 4, 1), ("440", 1, 2)):
        y = blocks(h // 8, w // 8, 3, 5, 0)
        cb = blocks(h // (8 * vy), w // (8 * hy), 7, 11, 1)
        cr = blocks(h // (8 * vy), w // (8 * hy), 13, 9, 2)
        jb = encode_jpeg_ycbcr(y, cb, cr, sub, quant_chroma=STD_LUMA_QUANT)
        planes, dw, dh = decode_jpeg_planes(jb)
        assert (dw, dh) == (w, h)
        assert planes[0].shape == (h, w)
        assert planes[1].shape == (h // vy, w // hy), sub
        # flat even blocks survive the lossy path bit-exactly
        assert np.array_equal(planes[0], y), sub
        assert np.array_equal(planes[1], cb), sub
        assert np.array_equal(planes[2], cr), sub
        # progressive twin produces the same pixels
        jp = encode_jpeg_progressive_ycbcr(
            y, cb, cr, sub, quant_chroma=STD_LUMA_QUANT
        )
        assert np.array_equal(decode_jpeg(jb), decode_jpeg(jp)), sub


def test_subsampling_422_restart_markers():
    """DRI/RSTn across 4:2:2 MCUs: predictors reset per restart."""
    from health_monitor_cc_flink_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    w, h = 96, 16  # 6 MCUs of 16x16 luma at 4:2:2 -> restarts mid-row
    by, bx = np.mgrid[0 : h // 8, 0 : w // 8]
    y = np.repeat(np.repeat(2 * ((3 * by + 7 * bx) % 128), 8, 0), 8, 1).astype(
        np.uint8
    )
    cby, cbx = np.mgrid[0 : h // 8, 0 : w // 16]
    cb = np.repeat(np.repeat(2 * ((5 * cby + 11 * cbx + 1) % 128), 8, 0), 8, 1).astype(np.uint8)
    cr = np.repeat(np.repeat(2 * ((9 * cby + 13 * cbx + 2) % 128), 8, 0), 8, 1).astype(np.uint8)
    jb = encode_jpeg_ycbcr(y, cb, cr, "422", quant_chroma=STD_LUMA_QUANT,
                           restart_interval=2)
    planes, _, _ = decode_jpeg_planes(jb)
    assert np.array_equal(planes[0], y)
    assert np.array_equal(planes[1], cb)
    assert np.array_equal(planes[2], cr)


def test_illegal_sampling_factor_combos_rejected():
    """T.81 B.2.2: factors outside 1..4 or >10 blocks/MCU must flag as
    corrupt (ValueError), and unknown encoder names must raise."""
    from health_monitor_cc_flink_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    y = np.zeros((16, 16), np.uint8)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_ycbcr(y, y, y, "421")
    # hand-patch a legal 4:2:0 stream's SOF to illegal factors
    cb = np.zeros((8, 8), np.uint8)
    jb = bytearray(encode_jpeg_ycbcr(y, cb, cb, "420"))
    sof = jb.find(b"\xff\xc0")
    comp0 = sof + 2 + 8  # first component entry: cid, hv, tq
    jb[comp0 + 1] = 0x55  # hi=5 > 4
    with pytest.raises(ValueError, match="1..4"):
        decode_jpeg_planes(bytes(jb))
    jb[comp0 + 1] = 0x43  # 4x3 = 12 blocks in one component > 10
    with pytest.raises(ValueError, match="blocks per MCU"):
        decode_jpeg_planes(bytes(jb))


def test_12bit_extended_sequential_roundtrip():
    """SOF1 12-bit: full-range flat even blocks round-trip DC-exact
    (16-bit DQT, extended DC categories, 2048 level shift, uint16
    out), with and without restart markers; natural images round-trip
    within quantization error; SOF0 with precision 12 is corrupt."""
    from health_monitor_cc_flink_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    by, bx = np.mgrid[0:6, 0:8]
    img = np.repeat(
        np.repeat(2 * ((7 + 599 * by + 211 * bx) % 2048), 8, 0), 8, 1
    ).astype(np.uint16)
    for ri in (0, 3):
        out = decode_jpeg_gray(encode_jpeg_gray(img, precision=12,
                                                restart_interval=ri))
        assert out.dtype == np.uint16 and np.array_equal(out, img), ri
    assert img.max() > 4000  # the range was actually exercised
    # smooth natural 12-bit content: bounded quantization error
    y, x = np.mgrid[0:48, 0:48]
    nat = ((8 * x + 11 * y) % 4096).astype(np.uint16)
    out = decode_jpeg_gray(encode_jpeg_gray(nat, precision=12))
    assert float(np.abs(out.astype(int) - nat.astype(int)).mean()) < 64
    # a baseline SOF0 marker claiming 12-bit precision is spec-invalid
    jb = bytearray(encode_jpeg_gray(nat.astype(np.uint8) % 256))
    sof = jb.index(b"\xff\xc0")
    jb[sof + 4] = 12
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg_gray(bytes(jb))
    # out-of-range samples rejected at encode time
    with pytest.raises(ValueError, match="out of range"):
        encode_jpeg_gray(np.full((8, 8), 5000, np.uint16), precision=12)


def test_planes_to_rgb_rejects_odd_sampling_shapes():
    # legal-but-odd T.81 sampling sets must raise, not silently
    # misalign: sub-resolution luma and fractional chroma ratios
    import numpy as np
    import pytest
    from health_monitor_cc_flink_spark.operators.jpeg import _planes_to_rgb

    h, w = 12, 12
    full = np.zeros((h, w), dtype=np.uint8)
    half = np.zeros((h, w // 2), dtype=np.uint8)
    # luma not full resolution (e.g. Y=1x1 beside a 2x2 chroma)
    with pytest.raises(NotImplementedError):
        _planes_to_rgb([half, full, full], w, h)
    # fractional chroma ratio 3:2 -> plane is 8 rows for h=12
    frac = np.zeros((8, w), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        _planes_to_rgb([full, frac, frac], w, h)
    # sane integer ratios still convert
    out = _planes_to_rgb([full, half, half], w, h)
    assert out.shape == (h, w, 3)


def test_12bit_color_sof1_roundtrip_exact():
    """12-bit 3-component SOF1: flat even blocks per plane (chroma on
    the luminance quant table) round-trip DC-exact at 444 and 420,
    with and without restart intervals."""
    import numpy as np

    from health_monitor_cc_flink_spark.operators.jpeg import (
        STD_LUMA_QUANT,
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    def plane12(d, bh, bw, a, b, c):
        by, bx = np.mgrid[0:bh, 0:bw]
        v = 2 * ((d + a * by + b * bx + c) % 2048)
        return np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint16)

    for d in (0, 7, 123):
        for sub, f in (("444", 1), ("420", 2)):
            w, h = 32, 32
            y = plane12(d, h // 8, w // 8, 599, 211, 0)
            cb = plane12(d, h // (8 * f), w // (8 * f), 401, 157, 1)
            cr = plane12(d, h // (8 * f), w // (8 * f), 613, 101, 2)
            jb = encode_jpeg_ycbcr(y, cb, cr, sub,
                                   quant_chroma=STD_LUMA_QUANT,
                                   precision=12, restart_interval=d % 3)
            planes, ww, hh = decode_jpeg_planes(jb)
            assert (ww, hh) == (w, h)
            assert planes[0].dtype == np.uint16
            assert np.array_equal(planes[0], y)
            assert np.array_equal(planes[1], cb)
            assert np.array_equal(planes[2], cr)
