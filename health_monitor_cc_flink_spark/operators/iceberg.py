"""Apache Iceberg snapshot walk — manifest list -> manifests -> files.

The second major lake table format (next to Delta, operators/
delta_log.py): an Iceberg snapshot is addressed by a MANIFEST LIST
(an Avro OCF whose records describe manifest files), each manifest
itself an Avro OCF of entries wrapping ``data_file`` records.  This
implements the PUBLIC Iceberg table-spec structures with their real
field names over this repo's from-scratch Avro OCF reader/writer
(sources/avro_ocf.py, codec extended with the unions/arrays/maps the
spec's schemas require):

* manifest-list entry: ``manifest_path``, ``manifest_length``,
  ``partition_spec_id``, nullable ``added_snapshot_id``, nullable
  added/existing/deleted file counts;
* manifest entry: ``status`` (0 EXISTING / 1 ADDED / 2 DELETED),
  nullable ``snapshot_id``, and the ``data_file`` record
  (``file_path``, ``file_format``, ``partition`` struct,
  ``record_count``, ``file_size_in_bytes``);
* the snapshot's LIVE file set = entries with status != DELETED —
  the list a planner scans.

``build_snapshot``/``walk_snapshot`` move the files as a plain
{name: bytes} dict; the registry query ships them in the repo's
ustar container like the Delta log.  Spec subset note: field-id
annotations and the full stats maps are omitted — they ride the same
codec paths (maps/arrays) already under test.
"""

from __future__ import annotations

import json

from ..sources.avro_ocf import read_ocf, write_ocf

STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2

MANIFEST_LIST_SCHEMA = json.dumps({
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
        {"name": "added_data_files_count", "type": ["null", "int"]},
        {"name": "existing_data_files_count", "type": ["null", "int"]},
        {"name": "deleted_data_files_count", "type": ["null", "int"]},
    ]})

MANIFEST_ENTRY_SCHEMA = json.dumps({
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file", "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": [
                        {"name": "lang", "type": ["null", "string"]},
                    ]}},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
            ]}},
    ]})


def build_snapshot(manifests: list[list[dict]], *,
                   snapshot_id: int = 1) -> dict[str, bytes]:
    """[[entry, ...] per manifest] -> {filename: OCF bytes} with the
    manifest list at metadata/snap-<id>.avro.  Each entry dict:
    {status, file_path, file_format, record_count,
    file_size_in_bytes, lang}."""
    files: dict[str, bytes] = {}
    list_records = []
    for i, entries in enumerate(manifests):
        recs = [{
            "status": e["status"],
            "snapshot_id": snapshot_id,
            "data_file": {
                "file_path": e["file_path"],
                "file_format": e["file_format"],
                "partition": {"lang": e.get("lang")},
                "record_count": e["record_count"],
                "file_size_in_bytes": e["file_size_in_bytes"],
            }} for e in entries]
        path = f"metadata/manifest-{i}.avro"
        blob = write_ocf(MANIFEST_ENTRY_SCHEMA, recs,
                         codec="deflate", sync_seed=i)
        files[path] = blob
        list_records.append({
            "manifest_path": path,
            "manifest_length": len(blob),
            "partition_spec_id": 0,
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": sum(
                1 for e in entries if e["status"] == STATUS_ADDED),
            "existing_data_files_count": sum(
                1 for e in entries if e["status"] == STATUS_EXISTING),
            "deleted_data_files_count": sum(
                1 for e in entries if e["status"] == STATUS_DELETED),
        })
    files[f"metadata/snap-{snapshot_id}.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA, list_records, codec="deflate",
        sync_seed=snapshot_id + 1000)
    return files


def walk_snapshot(files: dict[str, bytes],
                  snapshot_id: int = 1) -> dict:
    """Resolve a snapshot: read the manifest list, verify each
    manifest's recorded length, read its entries, and return the
    LIVE file census {n_manifests, live: [{manifest_idx, file_path,
    file_format, record_count, file_size_in_bytes, lang}]}."""
    list_path = f"metadata/snap-{snapshot_id}.avro"
    if list_path not in files:
        raise ValueError(f"missing manifest list {list_path}")
    mlist = read_ocf(files[list_path])["records"]
    live = []
    for i, mf in enumerate(mlist):
        path = mf["manifest_path"]
        if path not in files:
            raise ValueError(f"missing manifest {path}")
        blob = files[path]
        if len(blob) != mf["manifest_length"]:
            raise ValueError(f"manifest length mismatch for {path}")
        for e in read_ocf(blob)["records"]:
            if e["status"] == STATUS_DELETED:
                continue
            df = e["data_file"]
            live.append({
                "manifest_idx": i,
                "file_path": df["file_path"],
                "file_format": df["file_format"],
                "record_count": df["record_count"],
                "file_size_in_bytes": df["file_size_in_bytes"],
                "lang": df["partition"]["lang"],
            })
    return {"n_manifests": len(mlist), "live": live}
