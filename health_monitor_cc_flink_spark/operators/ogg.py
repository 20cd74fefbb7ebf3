"""Ogg container framing + Vorbis/Opus metadata headers.

Podcast/audio corpora ship as .ogg / .opus; triage needs the
container structure and the tag block (VorbisComment — also the tag
format FLAC reuses), not a DSP decode.  Implemented from the PUBLIC
specs from scratch (RFC 3533 Ogg framing, the Vorbis I spec header
packets, RFC 7845 Opus-in-Ogg):

* Ogg pages — 'OggS' capture, version 0, header-type flags (BOS /
  EOS / continued packet), 64-bit granule position, serial, page
  sequence, the Ogg CRC (CRC-32, polynomial 0x04C11DB7,
  NON-reflected, init 0, no final XOR — deliberately different from
  zlib's crc32, so stdlib can't stand in), and the 255-lacing
  segment table with packet spill across pages;
* packet reassembly across page boundaries (a lacing value of 255
  continues, < 255 terminates);
* Vorbis header packets 1 and 3 ('\\x01vorbis' identification:
  channels + rate; '\\x03vorbis' comments) and Opus 'OpusHead' /
  'OpusTags' — both share the VorbisComment layout (LE u32 lengths,
  vendor string, key=value user comments);
* audio data packets stay opaque (no invented codec tables).

``build_ogg`` is the deterministic synth/oracle vehicle.  Hostile
input raises ``ValueError``; page/packet counts and sizes are capped.

Beyond-reference corpus surface (the reference has no audio files),
same tier as the FLAC/WAV walks.
"""

from __future__ import annotations

import struct

MAX_PAGES = 1 << 12
MAX_PACKET_BYTES = 1 << 24

# Ogg CRC-32: poly 0x04C11DB7, not reflected, init 0, no final xor.
_CRC_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ byte]
    return crc


def _page(header_type: int, granule: int, serial: int, seq: int,
          segments: list[bytes]) -> bytes:
    lacing = b"".join(len(s).to_bytes(1, "little") for s in segments)
    body = b"".join(segments)
    head = struct.pack("<4sBBqIII B", b"OggS", 0, header_type, granule,
                       serial, seq, 0, len(segments)) + lacing
    crc = ogg_crc(head + body)
    head = head[:22] + struct.pack("<I", crc) + head[26:]
    return head + body


def _packets_to_pages(packets: list[bytes], serial: int,
                      start_seq: int, *, packets_per_page: int,
                      bos: bool = False, eos_last: bool = False,
                      granule_step: int = 960) -> list[bytes]:
    """Lace packets into pages, ``packets_per_page`` per page, packets
    over 255 bytes spilling via 255-lacing (within the page here —
    the synth keeps packets < 65025 so no page spill is needed)."""
    pages = []
    seq = start_seq
    for p0 in range(0, len(packets), packets_per_page):
        chunk = packets[p0:p0 + packets_per_page]
        segments: list[bytes] = []
        for pkt in chunk:
            for i in range(0, len(pkt), 255):
                segments.append(pkt[i:i + 255])
            if len(pkt) % 255 == 0:
                segments.append(b"")  # explicit terminator lacing 0
        htype = 0x02 if (bos and p0 == 0) else 0
        last = p0 + packets_per_page >= len(packets)
        if eos_last and last:
            htype |= 0x04
        pages.append(_page(htype, (p0 + len(chunk)) * granule_step,
                           serial, seq, segments))
        seq += 1
    return pages


def _vorbis_comment_block(vendor: str, comments: list[str]) -> bytes:
    out = struct.pack("<I", len(vendor.encode())) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for c in comments:
        enc = c.encode("utf-8")
        out += struct.pack("<I", len(enc)) + enc
    return out


def build_ogg(*, codec: str, serial: int, channels: int, rate: int,
              vendor: str, comments: list[str], audio: bytes,
              packet_bytes: int = 64, packets_per_page: int = 4) -> bytes:
    """Deterministic Ogg writer: BOS page with the identification
    header alone (as both specs require), a second page with the
    comment (+ Vorbis setup stub) packets, then the audio payload cut
    into ``packet_bytes`` opaque packets, ``packets_per_page`` per
    page, EOS on the last."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<IB I iii B", 0, channels,
                                             rate, 0, 128000, 0, 0xB8)
                 + b"\x01")
        tags = b"\x03vorbis" + _vorbis_comment_block(vendor, comments) \
            + b"\x01"
        setup = b"\x05vorbis" + b"\x00" * 8  # opaque stub
        header_pkts = [tags, setup]
    elif codec == "opus":
        ident = (b"OpusHead" + struct.pack("<BBHIhB", 1, channels, 312,
                                           rate, 0, 0))
        tags = b"OpusTags" + _vorbis_comment_block(vendor, comments)
        header_pkts = [tags]
    else:
        raise ValueError(f"unknown codec {codec}")
    data_pkts = [audio[i:i + packet_bytes]
                 for i in range(0, len(audio), packet_bytes)] or [b""]
    pages = _packets_to_pages([ident], serial, 0,
                              packets_per_page=1, bos=True,
                              granule_step=0)
    pages += _packets_to_pages(header_pkts, serial, 1,
                               packets_per_page=len(header_pkts),
                               granule_step=0)
    pages += _packets_to_pages(data_pkts, serial, 2,
                               packets_per_page=packets_per_page,
                               eos_last=True)
    return b"".join(pages)


def parse_ogg(data: bytes) -> dict:
    """Walk an Ogg stream -> {codec, channels, rate, vendor, comments,
    n_pages, n_packets, audio} with every page CRC verified and
    packets reassembled across pages."""
    pos = 0
    n_pages = 0
    packets: list[bytes] = []
    pending = b""
    while pos < len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if len(data) - pos < 27:
            raise ValueError("truncated Ogg page header")
        (version, htype, granule, serial, seq, crc, nseg
         ) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise ValueError(f"unknown Ogg version {version}")
        n_pages += 1
        if n_pages > MAX_PAGES:
            raise ValueError("Ogg page cap exceeded")
        lace_end = pos + 27 + nseg
        if lace_end > len(data):
            raise ValueError("truncated lacing table")
        lacing = data[pos + 27:lace_end]
        body_len = sum(lacing)
        if lace_end + body_len > len(data):
            raise ValueError("Ogg page body overruns input")
        page = bytearray(data[pos:lace_end + body_len])
        page[22:26] = b"\x00" * 4
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        if pending and not htype & 0x01:
            raise ValueError("dangling continued packet")
        body = data[lace_end:lace_end + body_len]
        off = 0
        for lace in lacing:
            pending += body[off:off + lace]
            off += lace
            if len(pending) > MAX_PACKET_BYTES:
                raise ValueError("Ogg packet cap exceeded")
            if lace < 255:
                packets.append(pending)
                pending = b""
        pos = lace_end + body_len
    if pending:
        raise ValueError("unterminated final packet")
    if not packets:
        raise ValueError("no Ogg packets")
    ident = packets[0]
    if ident[:7] == b"\x01vorbis":
        codec = "vorbis"
        channels = ident[11]
        (rate,) = struct.unpack_from("<I", ident, 12)
        tags_pkt = packets[1]
        if tags_pkt[:7] != b"\x03vorbis":
            raise ValueError("missing Vorbis comment header")
        tag_body = tags_pkt[7:]
        n_meta = 3
    elif ident[:8] == b"OpusHead":
        codec = "opus"
        channels = ident[9]
        (rate,) = struct.unpack_from("<I", ident, 12)
        tags_pkt = packets[1]
        if tags_pkt[:8] != b"OpusTags":
            raise ValueError("missing OpusTags")
        tag_body = tags_pkt[8:]
        n_meta = 2
    else:
        raise ValueError("unrecognized Ogg codec")
    (vlen,) = struct.unpack_from("<I", tag_body, 0)
    vendor = tag_body[4:4 + vlen].decode("utf-8")
    q = 4 + vlen
    (ncom,) = struct.unpack_from("<I", tag_body, q)
    q += 4
    comments = []
    for _ in range(ncom):
        (clen,) = struct.unpack_from("<I", tag_body, q)
        q += 4
        comments.append(tag_body[q:q + clen].decode("utf-8"))
        q += clen
    audio = b"".join(packets[n_meta:])
    return {
        "codec": codec,
        "channels": channels,
        "rate": rate,
        "vendor": vendor,
        "comments": comments,
        "n_pages": n_pages,
        "n_packets": len(packets),
        "audio": audio,
    }
