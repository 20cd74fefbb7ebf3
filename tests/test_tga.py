"""TGA decode edge cases: origins, RLE, colormap, hostile input."""

import pytest

from health_monitor_cc_flink_spark.operators.tga import build_tga, parse_tga

W, H = 10, 6
PAL = [(i, (2 * i) % 256, (3 * i) % 256) for i in range(256)]


def _grid_rgb():
    return [((3 * x) % 256, (5 * y) % 256, (x + y) % 256)
            for y in range(H) for x in range(W)]


def _grid_gray():
    return [(x + 2 * y) % 256 for y in range(H) for x in range(W)]


@pytest.mark.parametrize("top_down", [True, False])
def test_truecolor_both_origins_normalize(top_down):
    px = _grid_rgb()
    m = parse_tga(build_tga(image_type=2, width=W, height=H,
                            pixels=px, top_down=top_down))
    assert m["pixels"] == px
    assert (m["width"], m["height"], m["n_channels"]) == (W, H, 3)


def test_rle_runs_and_raw_packets():
    px = [(7, 11, 13) if y % 4 == 0 else ((3 * x) % 256, (5 * y) % 256,
                                          (x + y) % 256)
          for y in range(H) for x in range(W)]
    plain = build_tga(image_type=2, width=W, height=H, pixels=px)
    rle = build_tga(image_type=10, width=W, height=H, pixels=px)
    assert len(rle) < len(plain)  # flat rows must actually compress
    assert parse_tga(rle)["pixels"] == parse_tga(plain)["pixels"] == px


def test_rle_long_run_over_128_splits():
    px = [(1, 2, 3)] * (200 * 1)
    m = parse_tga(build_tga(image_type=10, width=200, height=1,
                            pixels=px))
    assert m["pixels"] == px


def test_colormap_indirection():
    px = [(x + y) % 256 for y in range(H) for x in range(W)]
    m = parse_tga(build_tga(image_type=1, width=W, height=H,
                            pixels=px, palette=PAL, top_down=False))
    assert m["pixels"] == [PAL[v] for v in px]
    assert m["n_channels"] == 3


def test_gray_rle_bottom_up():
    px = _grid_gray()
    m = parse_tga(build_tga(image_type=11, width=W, height=H,
                            pixels=px, top_down=False))
    assert m["pixels"] == [(v,) for v in px]


def test_bgra_alpha_and_footer():
    px = [((3 * x) % 256, (5 * y) % 256, (x + y) % 256,
           (x + 3 * y) % 256) for y in range(H) for x in range(W)]
    m = parse_tga(build_tga(image_type=2, width=W, height=H,
                            pixels=px, footer=True))
    assert m["pixels"] == px
    assert m["n_channels"] == 4


def test_image_id_skipped():
    px = _grid_gray()
    m = parse_tga(build_tga(image_type=3, width=W, height=H,
                            pixels=px, image_id=b"synthetic-id"))
    assert m["pixels"] == [(v,) for v in px]


def test_truncated_rejected():
    b = build_tga(image_type=2, width=W, height=H, pixels=_grid_rgb())
    with pytest.raises(ValueError):
        parse_tga(b[:30])


def test_rle_overrun_rejected():
    # header declares 2x1 but the run packet paints 128 pixels
    b = build_tga(image_type=10, width=2, height=1,
                  pixels=[(1, 1, 1), (2, 2, 2)])
    bad = b[:18] + b"\xff\x01\x01\x01"
    with pytest.raises(ValueError):
        parse_tga(bad)


def test_bad_type_rejected():
    b = bytearray(build_tga(image_type=3, width=W, height=H,
                            pixels=_grid_gray()))
    b[2] = 7  # unsupported base type
    with pytest.raises(ValueError):
        parse_tga(bytes(b))
