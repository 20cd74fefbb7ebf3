"""ustar + mbox container pins (operators/tar.py)."""

import io
import tarfile as stdlib_tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from health_monitor_cc_flink_spark.operators.tar import (
    build_tar,
    mbox_join,
    mbox_split,
    parse_tar,
)

MEMBERS = [("shard/", b""), ("shard/a.txt", b"hello world"),
           ("shard/deep/b.bin", bytes(range(256)) * 5)]


def test_tar_roundtrip_and_stdlib_conformance():
    t = build_tar(MEMBERS)
    got = parse_tar(t)
    assert [(m["name"], m["size"], m["typeflag"]) for m in got] == [
        ("shard/", 0, "5"), ("shard/a.txt", 11, "0"),
        ("shard/deep/b.bin", 1280, "0")]
    assert got[1]["data"] == b"hello world"
    # our writer must be readable by stdlib tarfile (conformance check)
    tf = stdlib_tarfile.open(fileobj=io.BytesIO(t))
    assert tf.getnames() == ["shard", "shard/a.txt", "shard/deep/b.bin"]
    assert tf.extractfile("shard/a.txt").read() == b"hello world"
    # and our parser must read a stdlib-written ustar archive
    buf = io.BytesIO()
    with stdlib_tarfile.open(fileobj=buf, mode="w",
                             format=stdlib_tarfile.USTAR_FORMAT) as w:
        for n, d in [("x.txt", b"abc"), ("y/z.txt", b"defgh")]:
            ti = stdlib_tarfile.TarInfo(n)
            ti.size = len(d)
            ti.mtime = 1735689600
            w.addfile(ti, io.BytesIO(d))
    ours = parse_tar(buf.getvalue())
    assert [(m["name"], m["data"]) for m in ours] == [
        ("x.txt", b"abc"), ("y/z.txt", b"defgh")]


def test_tar_prefix_split_long_names():
    long = "a" * 80 + "/" + "b" * 90 + ".txt"
    assert parse_tar(build_tar([(long, b"x")]))[0]["name"] == long
    with pytest.raises(ValueError, match="too long"):
        build_tar([("c" * 200, b"x")])  # no '/' to split at


def test_tar_hostiles_flag_cleanly():
    t = build_tar(MEMBERS)
    with pytest.raises(ValueError, match="truncated"):
        parse_tar(t[:500])
    with pytest.raises(ValueError, match="zero block"):
        parse_tar(b"\x00" * 512)
    corrupted = bytearray(t)
    corrupted[0] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(corrupted))
    # a symlink typeflag stays an explicit guard, not a misparse
    sym = bytearray(t)
    sym[156] = ord("2")
    ck = sum(sym[:148]) + 8 * 0x20 + sum(sym[156:512])
    sym[148:156] = b"%06o\x00 " % ck
    with pytest.raises(NotImplementedError, match="typeflag"):
        parse_tar(bytes(sym))


LONG = "deep/" * 30 + "x" * 60 + ".txt"   # ~210 chars, ustar-unsplittable
PAXY = [("short.txt", b"hello"), (LONG, b"world" * 100), ("dir/", b"")]


def test_tar_gnu_and_pax_longnames_roundtrip():
    want = [(n, b"" if n.endswith("/") else d) for n, d in PAXY]
    for strat in ("gnu", "pax"):
        for meta_all in (False, True):
            t = build_tar(PAXY, longname=strat, meta_all=meta_all)
            got = parse_tar(t)
            assert [(m["name"], m["data"]) for m in got] == want
            # stdlib tarfile as the independent interop oracle
            tf = stdlib_tarfile.open(fileobj=io.BytesIO(t))
            assert tf.extractfile(LONG).read() == b"world" * 100


def test_tar_parses_stdlib_pax_and_gnu_formats():
    for fmt in (stdlib_tarfile.PAX_FORMAT, stdlib_tarfile.GNU_FORMAT):
        bio = io.BytesIO()
        with stdlib_tarfile.open(fileobj=bio, mode="w", format=fmt) as w:
            ti = stdlib_tarfile.TarInfo(LONG)
            ti.size = 5
            ti.mtime = 1735689600
            w.addfile(ti, io.BytesIO(b"12345"))
        got = parse_tar(bio.getvalue())
        assert got[0]["name"] == LONG and got[0]["data"] == b"12345"
        assert got[0]["mtime"] == 1735689600


def test_tar_pax_global_header_defaults():
    from health_monitor_cc_flink_spark.operators.tar import (
        _data_blocks,
        _header,
        _pax_payload,
        _pax_records,
    )

    g = _pax_payload({"mtime": "1111111111"})
    raw = (
        _header("./pax_global_header", len(g), b"g", 0, 0o644)
        + _data_blocks(g)
        + _header("a.txt", 3, b"0", 0, 0o644) + _data_blocks(b"abc")
        + b"\x00" * 1024
    )
    got = parse_tar(raw)
    assert got[0]["mtime"] == 1111111111 and got[0]["data"] == b"abc"
    # pax size record overrides the header's octal field
    x = _pax_payload({"size": "3"})
    raw = (
        _header("./PaxHeaders.0/b.txt", len(x), b"x", 0, 0o644)
        + _data_blocks(x)
        + _header("b.txt", 0, b"0", 0, 0o644) + _data_blocks(b"xyz")
        + b"\x00" * 1024
    )
    assert parse_tar(raw)[0]["data"] == b"xyz"
    # self-referential length edge: record crossing the 100-byte mark
    recs = {"path": "p/" + "q" * 85}
    assert _pax_records(_pax_payload(recs)) == recs
    # hostile: unbounded meta-member run is capped
    meta = _header("././@LongLink", 2, b"L", 0, 0o644) + _data_blocks(b"n\x00")
    with pytest.raises(ValueError, match="meta-member run"):
        parse_tar(meta * 9 + b"\x00" * 1024)


def test_mbox_roundtrip_with_from_quoting():
    from health_monitor_cc_flink_spark.operators.mime import (
        build_email,
        parse_email,
    )

    bodies = [f"body {i}\nFrom the start of a line\n>From quoted"
              for i in range(3)]
    msgs = [build_email(f"Subj {i}", "a@x", "b@y", b)
            for i, b in enumerate(bodies)]
    back = mbox_split(mbox_join(msgs))
    assert len(back) == 3
    for i, m in enumerate(back):
        pm = parse_email(m)
        assert pm["subject"] == f"Subj {i}"
        assert pm["parts"][0]["text"] == bodies[i]
    with pytest.raises(ValueError, match="envelope"):
        mbox_split(b"not an mbox")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1200))
def test_tar_fuzz_arbitrary_bytes_fail_cleanly(data):
    try:
        parse_tar(data)
    except (ValueError, NotImplementedError):
        pass
    except Exception as exc:  # noqa: BLE001
        raise AssertionError(f"non-contract escape: {type(exc)}") from exc


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.from_regex(r"[a-z][a-z0-9_]{0,20}(\.[a-z]{1,4})?", fullmatch=True),
        st.binary(max_size=700),
    ),
    min_size=1, max_size=5,
))
def test_tar_fuzz_roundtrip(members):
    # unique names (duplicate names are legal but make comparison moot)
    seen = {}
    for n, d in members:
        seen[n] = d
    ms = sorted(seen.items())
    got = parse_tar(build_tar(ms))
    assert [(m["name"], m["data"]) for m in got] == ms
