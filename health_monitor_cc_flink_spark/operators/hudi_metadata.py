"""Hudi METADATA TABLE — the ``files`` index partition.

At 100 TB, listing a lake table by walking object-store directories is
the scaling wall: every query planner pays an O(files) LIST round-trip
storm.  Hudi's answer (PUBLIC spec, hudi.apache.org "Metadata Table";
layout shipped since 0.7) is an INTERNAL merge-on-read table under
``.hoodie/metadata/`` whose ``files`` partition holds one record per
data-table partition mapping filename -> {size, isDeleted}, plus the
``__all_partitions__`` key listing the partitions themselves.  Every
data-table commit appends a matching DELTACOMMIT to the metadata
table's single ``files-0000`` file group as a log block — so the
up-to-date listing is one file-group read (base + ordered log blocks,
map-merged), not a directory walk.

This module builds and reads that partition with the repo's OWN
HoodieLogFormat machinery (``hudi_log.py``, r15) and Avro codec:

* ``build_metadata_table`` — walk a data table's timeline (completed,
  non-rolled-back instants ascending, exactly the visibility rules
  ``reconstruct_table`` applies) and emit the metadata table members:
  one log file + one deltacommit instant per data instant, records
  Avro-encoded against the public HoodieMetadataRecord shape
  (key / type / filesystemMetadata map).
* ``read_metadata_listing`` — read the ``files-0000`` chain back and
  MAP-MERGE the records (later blocks override per filename;
  ``isDeleted`` drops — the metadata payload's merge is per-map-entry,
  not whole-record replace) into {partition: {filename: size}}.

The registry query certifies the metadata-table listing hash-matches
the direct timeline walk — the exact invariant Hudi's
``validateMetadataTable`` checks.

Hostile input raises ``ValueError``.
"""

from __future__ import annotations

import json

from .hudi import (
    COMPLETED,
    MAX_INSTANTS,
    _rolled_back_targets,
    parse_instant_filename,
)
from .hudi_log import AVRO_DATA_BLOCK, read_log_file, write_avro_data_block

#: public HoodieMetadataRecord field shape (HoodieMetadata.avsc):
#: key + type + the filesystem-metadata map; the bloom-filter /
#: column-stats fields of newer versions are additional union-null
#: fields a reader may ignore
METADATA_RECORD_SCHEMA = json.dumps({
    "type": "record", "name": "HoodieMetadataRecord", "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {"name": "filesystemMetadata", "type": ["null", {
            "type": "map", "values": {
                "type": "record", "name": "HoodieMetadataFileInfo",
                "fields": [
                    {"name": "size", "type": "long"},
                    {"name": "isDeleted", "type": "boolean"},
                ]}}], "default": None},
    ]})

#: record types (MetadataPartitionType): 1 = partition list under
#: the __all_partitions__ key, 2 = file listing keyed by partition
TYPE_PARTITION_LIST = 1
TYPE_FILE_LIST = 2

ALL_PARTITIONS_KEY = "__all_partitions__"
#: Hudi stores the empty (non-partitioned) relative path under "."
NON_PARTITIONED_KEY = "."

FILES_FILE_GROUP = "files-0000"


def _completed_instants(files: dict[str, bytes]) -> list[dict]:
    """Data-table timeline -> completed commit-like instants in
    time order with rollback targets erased (the reader-visibility
    rules reconstruct_table applies)."""
    instants = []
    for name, blob in files.items():
        info = parse_instant_filename(name)
        if info is None:
            continue
        info["blob"] = blob
        instants.append(info)
    if len(instants) > MAX_INSTANTS:
        raise ValueError("hudi instant cap exceeded")
    rolled_back = _rolled_back_targets(instants)
    completed = sorted(
        (i for i in instants if i["state"] == COMPLETED
         and i["action"] in ("commit", "deltacommit",
                             "replacecommit", "clean")
         and i["time"] not in rolled_back),
        key=lambda i: i["time"])
    times = [i["time"] for i in completed]
    if len(set(times)) != len(times):
        raise ValueError("duplicate hudi instant times")
    return completed


class MetadataTableBuilder:
    """INCREMENTAL metadata-table maintenance: call ``apply`` once
    per completed data-table instant (in timeline order) and merge
    the returned members into the table directory — the exact shape
    a streaming writer runs, one metadata deltacommit per data
    commit, never a rebuild from a full listing.
    ``build_metadata_table`` is this builder driven over a whole
    timeline, so incremental-vs-rebuild byte equality is a testable
    determinism certificate."""

    def __init__(self) -> None:
        # running (partition, fileId) -> {filename: size} so a
        # replacecommit can tombstone the files of the groups it
        # drops
        self._group_files: dict[tuple, dict[str, int]] = {}
        self._seen_partitions: set[str] = set()
        self._version = 1
        self._base_instant: str | None = None

    def apply(self, instant_time: str, action: str,
              doc: dict) -> dict[str, bytes]:
        """One completed data instant -> the metadata members it
        appends ({} when the instant carries no file effects)."""
        if not isinstance(doc, dict):
            raise ValueError("hudi commit json malformed")
        if self._base_instant is None:
            self._base_instant = instant_time
        per_part: dict[str, dict[str, dict]] = {}
        new_partitions: dict[str, dict] = {}
        if action == "clean":
            # HoodieCleanMetadata: per-partition successDeleteFiles
            # (old file-group versions the cleaner reclaimed)
            # become isDeleted entries
            for part, pm in (doc.get("partitionMetadata")
                             or {}).items():
                pkey = part or NON_PARTITIONED_KEY
                for path in (pm or {}).get(
                        "successDeleteFiles") or []:
                    fname = str(path).rsplit("/", 1)[-1]
                    per_part.setdefault(pkey, {})[fname] = {
                        "size": 0, "isDeleted": True}
                    for gfiles in self._group_files.values():
                        gfiles.pop(fname, None)
        for part, fids in (doc.get("partitionToReplaceFileIds")
                           or {}).items():
            pkey = part or NON_PARTITIONED_KEY
            for fid in fids:
                for fname, _sz in self._group_files.pop(
                        (pkey, fid), {}).items():
                    per_part.setdefault(pkey, {})[fname] = {
                        "size": 0, "isDeleted": True}
        for part, stats in (doc.get("partitionToWriteStats")
                            or {}).items():
            pkey = part or NON_PARTITIONED_KEY
            if pkey not in self._seen_partitions:
                self._seen_partitions.add(pkey)
                new_partitions[pkey] = {"size": 0,
                                        "isDeleted": False}
            for st in stats:
                fid = st.get("fileId")
                path = st.get("path")
                if not fid or not path:
                    raise ValueError(
                        "write stat missing fileId/path")
                fname = path.rsplit("/", 1)[-1]
                size = int(st.get("totalWriteBytes")
                           or st.get("fileSizeInBytes") or 0)
                per_part.setdefault(pkey, {})[fname] = {
                    "size": size, "isDeleted": False}
                self._group_files.setdefault(
                    (pkey, fid), {})[fname] = size
        records = []
        if new_partitions:
            records.append({
                "key": ALL_PARTITIONS_KEY,
                "type": TYPE_PARTITION_LIST,
                "filesystemMetadata": new_partitions,
            })
        for pkey in sorted(per_part):
            records.append({
                "key": pkey,
                "type": TYPE_FILE_LIST,
                "filesystemMetadata": per_part[pkey],
            })
        if not records:
            return {}
        blob = write_avro_data_block(
            METADATA_RECORD_SCHEMA, records, instant_time)
        log_name = (f".hoodie/metadata/files/.{FILES_FILE_GROUP}_"
                    f"{self._base_instant}.log."
                    f"{self._version}_0-1-0")
        self._version += 1
        return {
            log_name: blob,
            f".hoodie/metadata/.hoodie/{instant_time}"
            ".deltacommit": json.dumps(
                {"operationType": "UPSERT",
                 "partitionToWriteStats": {"files": [{
                     "fileId": FILES_FILE_GROUP,
                     "path": log_name.rsplit("/", 1)[-1],
                     "numWrites": len(records)}]}},
                sort_keys=True,
                separators=(",", ":")).encode("utf-8"),
        }


def build_metadata_table(files: dict[str, bytes]) -> dict[str, bytes]:
    """Data-table ``.hoodie/`` members -> metadata-table members:
    ``.hoodie/metadata/files/`` log files (one per data instant,
    appended to the ``files-0000`` group) plus the metadata table's
    own ``.hoodie/metadata/.hoodie/<t>.deltacommit`` instants.

    Per data instant the delta block records the instant's NEW files
    (size from the write stat) and — for a replacecommit — the
    replaced file groups' previous files as ``isDeleted`` entries,
    so the merged listing equals the direct walk at every point in
    the timeline (streaming-maintainable via MetadataTableBuilder,
    never rebuilt from a full listing)."""
    completed = _completed_instants(files)
    if not completed:
        raise ValueError("hudi timeline has no completed commits")
    out: dict[str, bytes] = {}
    builder = MetadataTableBuilder()
    for inst in completed:
        try:
            doc = json.loads(inst["blob"].decode("utf-8"))
        except ValueError as exc:
            raise ValueError("hudi commit json malformed") from exc
        out.update(builder.apply(inst["time"], inst["action"], doc))
    return out


def read_metadata_listing(
        metadata_files: dict[str, bytes]) -> dict:
    """Metadata-table members -> {partitions: [..], files:
    {partition: {filename: size}}} by reading the ``files-0000``
    log chain in version order and MAP-MERGING the records: later
    entries override per filename, ``isDeleted`` drops the file.
    Only log files named by the metadata table's own COMPLETED
    deltacommits participate (same reader rule as the data table —
    an inflight append is invisible)."""
    committed: set[str] = set()
    for name, blob in metadata_files.items():
        if "/metadata/.hoodie/" not in "/" + name:
            continue
        info = parse_instant_filename(name)
        if info is None or info["state"] != COMPLETED:
            continue
        try:
            doc = json.loads(blob.decode("utf-8"))
        except ValueError as exc:
            raise ValueError(
                "metadata deltacommit json malformed") from exc
        for stats in (doc.get("partitionToWriteStats")
                      or {}).values():
            for st in stats:
                if st.get("path"):
                    committed.add(st["path"])
    chain = []
    for name, blob in metadata_files.items():
        short = name.rsplit("/", 1)[-1]
        if "/metadata/files/" not in "/" + name \
                or short not in committed:
            continue
        try:
            version = int(short.split(".log.")[1].split("_")[0])
        except (IndexError, ValueError) as exc:
            raise ValueError(
                f"bad metadata log name {short!r}") from exc
        chain.append((version, blob))
    partitions: set[str] = set()
    listing: dict[str, dict[str, int]] = {}
    for _, blob in sorted(chain, key=lambda t: t[0]):
        for block in read_log_file(blob):
            if block.get("type") != AVRO_DATA_BLOCK:
                continue
            for rec in block.get("records") or []:
                fsmeta = rec.get("filesystemMetadata") or {}
                if rec.get("key") == ALL_PARTITIONS_KEY:
                    if rec.get("type") != TYPE_PARTITION_LIST:
                        raise ValueError(
                            "partition-list record mistyped")
                    for p, info in fsmeta.items():
                        if info.get("isDeleted"):
                            partitions.discard(p)
                        else:
                            partitions.add(p)
                    continue
                if rec.get("type") != TYPE_FILE_LIST:
                    raise ValueError(
                        f"unknown metadata record type "
                        f"{rec.get('type')!r}")
                part = listing.setdefault(rec["key"], {})
                for fname, info in fsmeta.items():
                    if info.get("isDeleted"):
                        part.pop(fname, None)
                    else:
                        part[fname] = int(info["size"])
    return {
        "partitions": sorted(partitions),
        "files": {p: dict(v) for p, v in listing.items() if v},
    }


# ---------------------------------------------------------------------------
# column_stats partition (r16): per-(file, column) min/max/null/value
# counts as metadata records — the stats-pruning half of the metadata
# table.  Real Hudi keys these records with hash-encoded
# ColumnIndexID/FileIndexID strings and types min/max as wrapper
# unions; this subset keys them readably ("<partition>|<file>|<col>")
# and carries long-typed bounds — the planning semantics (prune by
# [min, max] without opening files) are identical.
# ---------------------------------------------------------------------------

TYPE_COLUMN_STATS = 3

COLUMN_STATS_SCHEMA = json.dumps({
    "type": "record", "name": "HoodieMetadataColumnStats",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {"name": "fileName", "type": "string"},
        {"name": "columnName", "type": "string"},
        {"name": "minValue", "type": ["null", "long"],
         "default": None},
        {"name": "maxValue", "type": ["null", "long"],
         "default": None},
        {"name": "nullCount", "type": "long"},
        {"name": "valueCount", "type": "long"},
        {"name": "isDeleted", "type": "boolean"},
    ]})

COLSTATS_FILE_GROUP = "col-stats-0000"


def append_column_stats(instant_time: str, version: int,
                        base_instant: str,
                        stats: list[dict],
                        deleted_files: list[tuple] = ()) -> dict:
    """One data instant's column stats -> the column_stats
    partition members it appends: a log block of records (one per
    (file, column)) plus tombstone records for reclaimed files.
    Real Hudi commits ALL metadata partitions under ONE
    deltacommit; list the returned log file in that instant's
    commit via ``amend_deltacommit`` so the visibility rule covers
    it.  ``stats`` rows: {partition, fileName, columnName, min,
    max, nullCount, valueCount}."""
    records = []
    for st in stats:
        records.append({
            "key": (f"{st['partition']}|{st['fileName']}|"
                    f"{st['columnName']}"),
            "type": TYPE_COLUMN_STATS,
            "fileName": st["fileName"],
            "columnName": st["columnName"],
            "minValue": st.get("min"),
            "maxValue": st.get("max"),
            "nullCount": int(st.get("nullCount", 0)),
            "valueCount": int(st["valueCount"]),
            "isDeleted": False,
        })
    for part, fname, col in deleted_files:
        records.append({
            "key": f"{part}|{fname}|{col}",
            "type": TYPE_COLUMN_STATS,
            "fileName": fname, "columnName": col,
            "minValue": None, "maxValue": None,
            "nullCount": 0, "valueCount": 0,
            "isDeleted": True,
        })
    if not records:
        return {}
    blob = write_avro_data_block(
        COLUMN_STATS_SCHEMA, records, instant_time)
    log_name = (f".hoodie/metadata/column_stats/"
                f".{COLSTATS_FILE_GROUP}_{base_instant}"
                f".log.{version}_0-1-0")
    return {log_name: blob}


def amend_deltacommit(members: dict[str, bytes],
                      instant_time: str,
                      colstats_members: dict[str, bytes]) -> None:
    """List the column_stats log file(s) of ``instant_time`` inside
    the instant's existing metadata deltacommit (in place) — one
    deltacommit covers every metadata partition, the spec's commit
    shape."""
    dc_name = (f".hoodie/metadata/.hoodie/{instant_time}"
               f".deltacommit")
    if dc_name not in members:
        raise ValueError(
            f"no metadata deltacommit at {instant_time}")
    doc = json.loads(members[dc_name].decode("utf-8"))
    stats = doc.setdefault("partitionToWriteStats", {})
    bucket = stats.setdefault("column_stats", [])
    for name in sorted(colstats_members):
        bucket.append({
            "fileId": COLSTATS_FILE_GROUP,
            "path": name.rsplit("/", 1)[-1],
            "numWrites": 0,
        })
    members[dc_name] = json.dumps(
        doc, sort_keys=True,
        separators=(",", ":")).encode("utf-8")
    members.update(colstats_members)


def read_column_stats(metadata_files: dict[str, bytes]) -> dict:
    """column_stats members -> {(file, column): {min, max,
    nullCount, valueCount}} by log-chain merge (later wins,
    isDeleted drops) — same visibility rule as the files partition:
    only chains named by completed metadata deltacommits count."""
    committed: set[str] = set()
    for name, blob in metadata_files.items():
        if "/metadata/.hoodie/" not in "/" + name:
            continue
        info = parse_instant_filename(name)
        if info is None or info["state"] != COMPLETED:
            continue
        try:
            doc = json.loads(blob.decode("utf-8"))
        except ValueError as exc:
            raise ValueError(
                "metadata deltacommit json malformed") from exc
        for stats in (doc.get("partitionToWriteStats")
                      or {}).values():
            for st in stats:
                if st.get("path"):
                    committed.add(st["path"])
    chain = []
    for name, blob in metadata_files.items():
        short = name.rsplit("/", 1)[-1]
        if "/metadata/column_stats/" not in "/" + name \
                or short not in committed:
            continue
        try:
            version = int(short.split(".log.")[1].split("_")[0])
        except (IndexError, ValueError) as exc:
            raise ValueError(
                f"bad metadata log name {short!r}") from exc
        chain.append((version, blob))
    out: dict[tuple, dict] = {}
    for _, blob in sorted(chain, key=lambda t: t[0]):
        for block in read_log_file(blob):
            if block.get("type") != AVRO_DATA_BLOCK:
                continue
            for rec in block.get("records") or []:
                if rec.get("type") != TYPE_COLUMN_STATS:
                    raise ValueError(
                        "column_stats record mistyped")
                key = (rec["fileName"], rec["columnName"])
                if rec.get("isDeleted"):
                    out.pop(key, None)
                    continue
                out[key] = {
                    "min": rec.get("minValue"),
                    "max": rec.get("maxValue"),
                    "nullCount": rec["nullCount"],
                    "valueCount": rec["valueCount"],
                }
    return out


def prune_by_column_stats(col_stats: dict, column: str,
                          lo: int, hi: int) -> dict:
    """Planning: which files can contain a value of ``column`` in
    [lo, hi]?  Files whose stats row is MISSING for the column
    cannot prune (conservative keep — the same rule every stats
    pruner follows); all-null files prune.  Returns {candidates:
    [file], pruned: [file], n_unstated}."""
    candidates = []
    pruned = []
    seen_files: dict[str, bool] = {}
    for (fname, col), st in col_stats.items():
        if col != column:
            seen_files.setdefault(fname, False)
            continue
        seen_files[fname] = True
        mn, mx = st.get("min"), st.get("max")
        if mn is None and mx is None:
            # all-null column in this file: cannot match a range
            pruned.append(fname)
        elif mn is not None and mx is not None \
                and not (mx < lo or mn > hi):
            candidates.append(fname)
        else:
            pruned.append(fname)
    unstated = [f for f, has in seen_files.items() if not has]
    return {"candidates": sorted(set(candidates) | set(unstated)),
            "pruned": sorted(pruned),
            "n_unstated": len(unstated)}
