"""Hudi MERGE-ON-READ log files — HoodieLogFormat blocks + the
file-group log-merge that gives MOR its semantics.

Hudi's MOR tables (PUBLIC spec at hudi.apache.org, "Table & Query
Types" + the HoodieLogFormat javadoc shipped in every 0.x/1.x
release) keep each file group as one BASE parquet file plus an
ordered chain of LOG files appended by deltacommits; readers merge
the chain onto the base at query time (latest value per record key
wins, ordered by the precombine field then arrival), and a
COMPACTION instant folds the chain into a fresh base file.

Log file layout (HoodieLogFormat version 1): the file is a
concatenation of blocks, each

    MAGIC           6 bytes  ``#HUDI#``
    block size      8 bytes  big-endian; bytes AFTER this field
                             through the trailing reverse pointer
    format version  4 bytes  big-endian (1)
    block type      4 bytes  big-endian HoodieLogBlockType ordinal
                             (COMMAND=0, DELETE=1, CORRUPT=2,
                             AVRO_DATA=3, HFILE_DATA=4,
                             PARQUET_DATA=5)
    header map      4-byte entry count, then per entry a 4-byte
                    HeaderMetadataType ordinal (INSTANT_TIME=0,
                    TARGET_INSTANT_TIME=1, SCHEMA=2,
                    COMMAND_BLOCK_TYPE=3) + 4-byte length + utf-8
    content length  8 bytes big-endian
    content         HoodieAvroDataBlock: 4-byte format version,
                    4-byte record count, then per record a 4-byte
                    length + Avro binary-encoded record
    footer map      same shape as the header map
    reverse pointer 8 bytes big-endian: TOTAL block length including
                    magic — the backward-scan hook log readers use

Deletes ride the spec's ``_hoodie_is_deleted`` boolean record field
(the sentinel Hudi's payload classes honor) rather than a separate
DELETE block.  Log file names follow the spec's
``<fileId>_<baseInstant>.log.<version>_<writeToken>`` shape.

Hostile input raises ``ValueError``.
"""

from __future__ import annotations

import re
import struct

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1

#: HoodieLogBlockType ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

#: HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

MAX_BLOCKS = 1 << 16
MAX_RECORDS = 1 << 24

_LOG_NAME_RE = re.compile(
    r"^(?P<file_id>[A-Za-z0-9\-]+)_(?P<base_instant>\d{8,17})"
    r"\.log\.(?P<version>\d+)_(?P<write_token>[\w\-]+)$")


def log_file_name(file_id: str, base_instant: str,
                  version: int = 1,
                  write_token: str = "0-1-0") -> str:
    return f"{file_id}_{base_instant}.log.{version}_{write_token}"


def parse_log_file_name(name: str) -> dict | None:
    """Log member name -> {file_id, base_instant, version} or None
    for non-log members."""
    m = _LOG_NAME_RE.match(name.rsplit("/", 1)[-1])
    if not m:
        return None
    return {"file_id": m.group("file_id"),
            "base_instant": m.group("base_instant"),
            "version": int(m.group("version"))}


def _pack_meta(meta: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(meta))
    for k in sorted(meta):
        raw = meta[k].encode("utf-8")
        out += struct.pack(">ii", k, len(raw)) + raw
    return out


def _unpack_meta(data: bytes, pos: int) -> tuple[dict[int, str], int]:
    if pos + 4 > len(data):
        raise ValueError("log block meta truncated")
    (n,) = struct.unpack_from(">i", data, pos)
    pos += 4
    if not 0 <= n <= 64:
        raise ValueError("log block meta count out of range")
    meta: dict[int, str] = {}
    for _ in range(n):
        if pos + 8 > len(data):
            raise ValueError("log block meta entry truncated")
        k, ln = struct.unpack_from(">ii", data, pos)
        pos += 8
        if ln < 0 or pos + ln > len(data):
            raise ValueError("log block meta value truncated")
        meta[k] = data[pos:pos + ln].decode("utf-8")
        pos += ln
    return meta, pos


def write_log_block(block_type: int, header: dict[int, str],
                    content: bytes,
                    footer: dict[int, str] | None = None) -> bytes:
    """One HoodieLogFormat block; concatenate for a log file."""
    hdr = _pack_meta(header)
    ftr = _pack_meta(footer or {})
    body = (struct.pack(">i", LOG_FORMAT_VERSION)
            + struct.pack(">i", block_type)
            + hdr
            + struct.pack(">q", len(content))
            + content
            + ftr)
    # body + the 8-byte reverse pointer are what "block size" spans
    total = len(MAGIC) + 8 + len(body) + 8
    return (MAGIC + struct.pack(">q", len(body) + 8) + body
            + struct.pack(">q", total))


def write_avro_data_block(schema_json: str, records: list[dict],
                          instant_time: str) -> bytes:
    """AVRO_DATA block: records Avro-binary-encoded against the
    header's schema (4-byte count + per-record 4-byte length)."""
    from ..sources.avro_codec import encode_record

    content = struct.pack(">i", 3)  # HoodieAvroDataBlock version
    content += struct.pack(">i", len(records))
    for rec in records:
        raw = encode_record(schema_json, rec)
        content += struct.pack(">i", len(raw)) + raw
    return write_log_block(
        AVRO_DATA_BLOCK,
        {H_INSTANT_TIME: instant_time, H_SCHEMA: schema_json},
        content)


def read_log_file(blob: bytes) -> list[dict]:
    """Log file bytes -> ordered blocks [{type, header, footer,
    records (for AVRO_DATA), content}] with every size field
    cross-checked (a bad reverse pointer or truncated content is a
    loud ValueError, not a silent partial read)."""
    from ..sources.avro_codec import decode_record

    blocks: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if len(blocks) >= MAX_BLOCKS:
            raise ValueError("log block cap exceeded")
        start = pos
        if blob[pos:pos + 6] != MAGIC:
            raise ValueError("log block magic mismatch")
        pos += 6
        if pos + 8 > n:
            raise ValueError("log block size truncated")
        (bsize,) = struct.unpack_from(">q", blob, pos)
        pos += 8
        if bsize < 16 or pos + bsize > n:
            raise ValueError("log block size out of range")
        end = pos + bsize
        ver, btype = struct.unpack_from(">ii", blob, pos)
        pos += 8
        if ver != LOG_FORMAT_VERSION:
            raise ValueError(f"log format version {ver} unsupported")
        header, pos = _unpack_meta(blob, pos)
        if pos + 8 > n:
            raise ValueError("log content length truncated")
        (clen,) = struct.unpack_from(">q", blob, pos)
        pos += 8
        if clen < 0 or pos + clen > end:
            raise ValueError("log content truncated")
        content = blob[pos:pos + clen]
        pos += clen
        footer, pos = _unpack_meta(blob, pos)
        if pos + 8 != end:
            raise ValueError("log block trailer misplaced")
        (total,) = struct.unpack_from(">q", blob, pos)
        pos += 8
        if total != end - start:
            raise ValueError("log block reverse pointer mismatch")
        block = {"type": btype, "header": header, "footer": footer,
                 "content": content}
        if btype == AVRO_DATA_BLOCK:
            schema = header.get(H_SCHEMA)
            if schema is None:
                raise ValueError("avro data block missing schema")
            if len(content) < 8:
                raise ValueError("avro data block header truncated")
            _fmt, cnt = struct.unpack_from(">ii", content, 0)
            if not 0 <= cnt <= MAX_RECORDS:
                raise ValueError("avro record count out of range")
            cpos = 8
            recs = []
            for _ in range(cnt):
                if cpos + 4 > len(content):
                    raise ValueError("avro record length truncated")
                (rlen,) = struct.unpack_from(">i", content, cpos)
                cpos += 4
                if rlen < 0 or cpos + rlen > len(content):
                    raise ValueError("avro record truncated")
                recs.append(decode_record(
                    schema, content[cpos:cpos + rlen]))
                cpos += rlen
            block["records"] = recs
        blocks.append(block)
    return blocks


def merge_log_records(base_rows: list[dict],
                      log_blocks: list[dict],
                      key_field: str,
                      precombine_field: str) -> list[dict]:
    """The MOR snapshot-read merge: apply AVRO_DATA blocks in log
    order onto the base rows; per record key the row with the
    HIGHEST precombine value wins (ties -> later block wins, the
    arrival-order tiebreak Hudi's default payload uses), and a
    winning row carrying ``_hoodie_is_deleted`` = true drops the
    key.  Returns rows sorted by key."""
    state: dict = {}
    order: dict = {}
    for row in base_rows:
        if key_field not in row:
            raise ValueError("base row missing record key")
        state[row[key_field]] = dict(row)
        order[row[key_field]] = (-1, -1)
    for bi, block in enumerate(log_blocks):
        if block.get("type") != AVRO_DATA_BLOCK:
            continue
        for ri, rec in enumerate(block.get("records") or []):
            if key_field not in rec:
                raise ValueError("log record missing record key")
            k = rec[key_field]
            new_pc = rec.get(precombine_field)
            cur = state.get(k)
            if cur is not None:
                cur_pc = cur.get(precombine_field)
                if cur_pc is not None and new_pc is not None \
                        and new_pc < cur_pc:
                    continue
                if new_pc == cur_pc and (bi, ri) < order.get(
                        k, (-1, -1)):
                    continue
            state[k] = dict(rec)
            order[k] = (bi, ri)
    return [state[k] for k in sorted(state)
            if not state[k].get("_hoodie_is_deleted")]
