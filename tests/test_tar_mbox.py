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
    # a GNU long-name header is an explicit guard, not a misparse
    gnu = bytearray(t)
    gnu[156] = ord("L")
    ck = sum(gnu[:148]) + 8 * 0x20 + sum(gnu[156:512])
    gnu[148:156] = b"%06o\x00 " % ck
    with pytest.raises(NotImplementedError, match="long-name|PAX"):
        parse_tar(bytes(gnu))


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
