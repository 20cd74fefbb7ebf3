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
                   snapshot_id: int = 1,
                   manifest_prefix: str = "manifest") -> dict[str, bytes]:
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
        path = f"metadata/{manifest_prefix}-{i}.avro"
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


#: format-version 2 (merge-on-read): manifests carry ``content``
#: (0 data / 1 deletes) and data_file carries ``content``
#: (0 DATA / 1 POSITION_DELETES / 2 EQUALITY_DELETES) — table-spec
#: "Manifest Lists" / "Manifests" / "Delete Formats"
MANIFEST_LIST_SCHEMA_V2 = json.dumps({
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
        {"name": "added_files_count", "type": ["null", "int"]},
        {"name": "existing_files_count", "type": ["null", "int"]},
        {"name": "deleted_files_count", "type": ["null", "int"]},
    ]})

MANIFEST_ENTRY_SCHEMA_V2 = json.dumps({
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "partition", "type": {
                    "type": "record", "name": "r102", "fields": [
                        {"name": "lang", "type": ["null", "string"]},
                    ]}},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                {"name": "equality_ids",
                 "type": ["null",
                          {"type": "array", "items": "int"}]},
                # per-column value bounds (table-spec "Manifests":
                # map<field id, serialized bound>) — carried as the
                # spec's array-of-key/value-record map encoding so
                # scan PLANNING can prune files without opening them
                {"name": "lower_bounds", "default": None,
                 "type": ["null", {
                     "type": "array", "items": {
                         "type": "record", "name": "k_v_lower",
                         "fields": [
                             {"name": "key", "type": "int"},
                             {"name": "value", "type": "bytes"},
                         ]}}]},
                {"name": "upper_bounds", "default": None,
                 "type": ["null", {
                     "type": "array", "items": {
                         "type": "record", "name": "k_v_upper",
                         "fields": [
                             {"name": "key", "type": "int"},
                             {"name": "value", "type": "bytes"},
                         ]}}]},
                # v3 DELETION VECTORS (table-spec v3 "Position
                # Delete Files" + Puffin spec): a DV delete entry
                # names the single data file it covers and the
                # blob's [offset, size) inside its Puffin file
                {"name": "referenced_data_file", "default": None,
                 "type": ["null", "string"]},
                {"name": "content_offset", "default": None,
                 "type": ["null", "long"]},
                {"name": "content_size_in_bytes", "default": None,
                 "type": ["null", "long"]},
            ]}},
    ]})


def bound_long(v: int) -> bytes:
    """Iceberg single-value serialization of a long bound: 8-byte
    little-endian (table-spec Appendix D)."""
    import struct as _s

    return _s.pack("<q", v)


def unbound_long(raw: bytes) -> int:
    import struct as _s

    return _s.unpack("<q", bytes(raw))[0]


def load_scan_entries_v2(files: dict[str, bytes], *,
                         snapshot_id: int = 1) -> list[tuple]:
    """Parse the snapshot's data manifests ONCE into a list of
    (data_file dict, lower_bounds-by-field-id, upper_bounds-by-
    field-id) live entries.  Split out of scan_plan_v2 so repeated
    probes over the same snapshot (point-lookup planning loops)
    decode the Avro manifests a single time instead of per probe —
    the planning itself is O(entries) dict lookups."""
    list_path = f"metadata/snap-{snapshot_id}.avro"
    if list_path not in files:
        raise ValueError(f"missing manifest list {list_path}")
    mlist = read_ocf(files[list_path])["records"]
    entries: list[tuple] = []
    for mf in mlist:
        if mf.get("content", CONTENT_DATA) != CONTENT_DATA:
            continue
        path = mf["manifest_path"]
        if path not in files:
            raise ValueError(f"missing manifest {path}")
        for e in read_ocf(files[path])["records"]:
            if e["status"] == STATUS_DELETED:
                continue
            df = e["data_file"]
            if df.get("content", CONTENT_DATA) != CONTENT_DATA:
                continue
            lows = {kv["key"]: kv["value"]
                    for kv in (df.get("lower_bounds") or [])}
            highs = {kv["key"]: kv["value"]
                     for kv in (df.get("upper_bounds") or [])}
            entries.append((df, lows, highs))
    return entries


def plan_from_entries(entries: list[tuple],
                      ranges: dict[int, tuple[int, int]] | None = None
                      ) -> dict:
    """Plan one scan over pre-parsed manifest entries (from
    load_scan_entries_v2): keep files whose lower/upper_bounds
    intersect every requested per-field range (long-typed bounds).
    Files without bounds for a requested field are kept (bounds are
    optional — absence may not prune)."""
    ranges = ranges or {}
    candidates = []
    for df, lows, highs in entries:
        keep = True
        for fid, (lo, hi) in ranges.items():
            if fid in lows and unbound_long(lows[fid]) > hi:
                keep = False
                break
            if fid in highs and unbound_long(highs[fid]) < lo:
                keep = False
                break
        if keep:
            candidates.append(df)
    return {"candidates": candidates, "n_total": len(entries),
            "n_skipped": len(entries) - len(candidates)}


def scan_plan_v2(files: dict[str, bytes], *, snapshot_id: int = 1,
                 ranges: dict[int, tuple[int, int]] | None = None
                 ) -> dict:
    """SCAN PLANNING over manifest metadata only — the step a real
    Iceberg planner runs before any data file opens: walk the
    snapshot's data manifests and keep files whose
    lower/upper_bounds intersect every requested per-field range
    (long-typed bounds).  Files without bounds for a requested
    field are kept (bounds are optional — absence may not prune).
    Returns {candidates: [data_file dicts], n_total, n_skipped};
    O(manifest bytes), data files untouched."""
    return plan_from_entries(
        load_scan_entries_v2(files, snapshot_id=snapshot_id), ranges)

CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2


def build_positional_delete_parquet(
        deletes: list[tuple[str, int]]) -> bytes:
    """Positional delete file content (table-spec Delete Formats):
    rows of (file_path: string, pos: long), sorted by file_path then
    pos — written as REAL parquet via pyarrow (the reference fixture
    writer), read back by this repo's own page reader."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    deletes = sorted(deletes)
    t = pa.table({
        "file_path": pa.array([p for p, _ in deletes], pa.string()),
        "pos": pa.array([p for _, p in deletes], pa.int64()),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy")
    return buf.getvalue()


def read_positional_delete_parquet(data: bytes) -> list[tuple[str, int]]:
    from .parquet_data import read_column_chunk
    from .parquet_meta import parse_footer

    m = parse_footer(data)
    leaves = {l["path"]: l for l in m["schema_leaves"]}
    cols = {}
    for path in ("file_path", "pos"):
        leaf = leaves.get(path)
        if leaf is None:
            raise ValueError("positional delete file missing "
                             f"column {path}")
        vals: list = []
        for rg in m["row_groups"]:
            cc = next(c for c in rg["columns"]
                      if c["path"] == path)
            start = (cc["dictionary_page_offset"]
                     or cc["data_page_offset"])
            vals.extend(read_column_chunk(
                data, start_offset=start,
                num_values=cc["num_values"], ptype=cc["type"],
                codec=cc["codec"],
                max_def_level=leaf["max_def_level"]))
        cols[path] = vals
    out = []
    for p, pos in zip(cols["file_path"], cols["pos"]):
        if p is None or pos is None or pos < 0:
            raise ValueError("bad positional delete row")
        out.append((p.decode("utf-8")
                    if isinstance(p, (bytes, bytearray)) else p,
                    pos))
    return out


def read_flat_parquet(data: bytes,
                      columns: list[str] | None = None
                      ) -> dict[str, list]:
    """Flat parquet blob -> {column: values} via the repo's own page
    reader (strings decoded utf-8).  ``columns`` prunes the read to
    the named leaves (decode cost is per column chunk, so a
    1-of-N-column read skips the other chunks entirely)."""
    from .parquet_data import read_column_chunk
    from .parquet_meta import parse_footer

    m = parse_footer(data)
    out: dict[str, list] = {}
    leaves = m["schema_leaves"]
    if columns is not None:
        want = set(columns)
        leaves = [l for l in leaves if l["path"] in want]
        missing = want - {l["path"] for l in leaves}
        if missing:
            raise ValueError(
                f"columns absent from parquet schema: {sorted(missing)}")
    for leaf in leaves:
        vals: list = []
        for rg in m["row_groups"]:
            cc = next(c for c in rg["columns"]
                      if c["path"] == leaf["path"])
            start = (cc["dictionary_page_offset"]
                     or cc["data_page_offset"])
            vals.extend(read_column_chunk(
                data, start_offset=start,
                num_values=cc["num_values"], ptype=cc["type"],
                codec=cc["codec"],
                max_def_level=leaf["max_def_level"],
                max_rep_level=leaf["max_rep_level"],
                rep_def_level=leaf["rep_def_level"],
                type_length=leaf["type_length"]))
        if leaf["type"] == "BYTE_ARRAY":
            vals = [v.decode("utf-8")
                    if isinstance(v, (bytes, bytearray)) else v
                    for v in vals]
        out[leaf["path"]] = vals
    return out


def read_flat_orc(data: bytes) -> dict[str, list]:
    """Flat ORC blob -> {column: values} via the repo's own stripe
    reader (all stripes concatenated)."""
    from .orc_data import read_stripe_column
    from .orc_meta import parse_orc_tail

    m = parse_orc_tail(data)
    out: dict[str, list] = {}
    for ci, (kind, name) in enumerate(m["schema"], start=1):
        vals: list = []
        for st in m["stripes"]:
            vals.extend(read_stripe_column(
                data, st, kind, ci, m["compression"],
                st["n_rows"], types=m["types"]))
        out[name] = vals
    return out


def read_flat_avro(data: bytes) -> dict[str, list]:
    """Flat Avro OCF blob -> {column: values} via the repo's own
    OCF reader (column order from the writer schema)."""
    import json as _json

    from ..sources.avro_ocf import read_ocf

    ocf = read_ocf(data)
    schema = ocf.get("schema")
    fields = []
    if schema:
        doc = (_json.loads(schema)
               if isinstance(schema, str) else schema)
        fields = [f["name"] for f in doc.get("fields", [])]
    records = ocf["records"]
    if not fields:
        fields = list(records[0]) if records else []
    return {name: [r.get(name) for r in records]
            for name in fields}


def read_data_file(data: bytes, file_format: str) -> dict[str, list]:
    """Iceberg data-file decode dispatch: the spec's three data
    formats, each through THIS repo's own reader."""
    fmt = (file_format or "").upper()
    if fmt == "PARQUET":
        return read_flat_parquet(data)
    if fmt == "ORC":
        return read_flat_orc(data)
    if fmt == "AVRO":
        return read_flat_avro(data)
    raise ValueError(f"unsupported iceberg data format {file_format}")


def build_snapshot_v2(manifests: list[list[dict]],
                      delete_files: list[list[tuple[str, int]]], *,
                      equality_deletes: list[tuple] = (),
                      deletion_vectors: list[tuple] = (),
                      data_blobs: dict[str, bytes] | None = None,
                      snapshot_id: int = 1,
                      data_sequence_number: int | None = None,
                      delete_sequence_number: int | None = None,
                      ) -> dict[str, bytes]:
    """Format-version 2 snapshot: data manifests as in v1 plus one
    DELETES-content manifest whose entries point at positional
    delete parquet files (``delete_files`` = list of (file_path,
    pos) lists, one per delete file).  ``equality_deletes`` entries
    are (parquet_blob, equality_ids, record_count) — content-2
    files whose rows delete any data row matching on the id'd
    columns — or 4-tuples with a trailing per-file data sequence
    number.  ``data_blobs`` ships the actual data parquet bytes for
    scan-capable snapshots.

    Sequence numbers (table-spec "Sequence Numbers"): every manifest
    carries its data sequence number in the manifest list, inherited
    by entries whose own ``sequence_number`` is null.  The defaults
    model the canonical MOR history — data committed at
    ``snapshot_id``, delete files one commit later — so positional
    deletes (applied where data_seq <= delete_seq) AND equality
    deletes (strictly data_seq < delete_seq) both hit the shipped
    data files.  Per-entry overrides: a ``sequence_number`` key in a
    ``manifests`` entry dict, or the 4-tuple equality form."""
    files: dict[str, bytes] = {}
    list_records = []
    data_seq = (snapshot_id if data_sequence_number is None
                else data_sequence_number)
    del_seq = (data_seq + 1 if delete_sequence_number is None
               else delete_sequence_number)

    def manifest_record(path: str, blob: bytes, content: int,
                        entries: list[dict],
                        sequence_number: int = 0) -> dict:
        return {
            "manifest_path": path,
            "manifest_length": len(blob),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": sequence_number,
            "added_snapshot_id": snapshot_id,
            "added_files_count": sum(
                1 for e in entries if e["status"] == STATUS_ADDED),
            "existing_files_count": sum(
                1 for e in entries if e["status"] == STATUS_EXISTING),
            "deleted_files_count": sum(
                1 for e in entries if e["status"] == STATUS_DELETED),
        }

    for i, entries in enumerate(manifests):
        recs = [{
            "status": e["status"],
            "snapshot_id": snapshot_id,
            "sequence_number": e.get("sequence_number"),
            "data_file": {
                "content": CONTENT_DATA,
                "file_path": e["file_path"],
                "file_format": e["file_format"],
                "partition": {"lang": e.get("lang")},
                "record_count": e["record_count"],
                "file_size_in_bytes": e["file_size_in_bytes"],
                "equality_ids": None,
            }} for e in entries]
        path = f"metadata/manifest-{i}.avro"
        blob = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, recs,
                         codec="deflate", sync_seed=i)
        files[path] = blob
        list_records.append(
            manifest_record(path, blob, CONTENT_DATA, entries,
                            sequence_number=data_seq))
    if data_blobs:
        files.update(data_blobs)
    if delete_files or equality_deletes or deletion_vectors:
        del_entries = []
        for j, dels in enumerate(delete_files):
            dpath = f"data/deletes-{j}.parquet"
            dblob = build_positional_delete_parquet(dels)
            files[dpath] = dblob
            del_entries.append({
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "data_file": {
                    "content": CONTENT_POSITION_DELETES,
                    "file_path": dpath,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": len(dels),
                    "file_size_in_bytes": len(dblob),
                    "equality_ids": None,
                }})
        for j, espec in enumerate(equality_deletes):
            eblob, eq_ids, rc = espec[:3]
            eseq = espec[3] if len(espec) > 3 else None
            epath = f"data/eq-deletes-{j}.parquet"
            files[epath] = eblob
            del_entries.append({
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "sequence_number": eseq,
                "data_file": {
                    "content": CONTENT_EQUALITY_DELETES,
                    "file_path": epath,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": rc,
                    "file_size_in_bytes": len(eblob),
                    "equality_ids": list(eq_ids),
                }})
        if deletion_vectors:
            # v3 DELETION VECTORS: all DVs of a commit ride ONE
            # Puffin file (the layout the spec recommends so a
            # commit adds one object, not one per data file);
            # ``deletion_vectors`` = [(referenced_data_file,
            # positions[, sequence_number])]
            from .puffin import (
                DELETION_VECTOR_V1,
                serialize_dv_blob,
                write_puffin,
            )

            blobs = []
            for spec in deletion_vectors:
                ref, positions = spec[:2]
                blobs.append({
                    "data": serialize_dv_blob(list(positions)),
                    "type": DELETION_VECTOR_V1,
                    "snapshot-id": snapshot_id,
                    "sequence-number": del_seq,
                    "properties": {
                        "referenced-data-file": ref,
                        "cardinality":
                            str(len(set(positions)))},
                })
            ppath = "data/deletes-dv.puffin"
            pblob = write_puffin(blobs)
            files[ppath] = pblob
            for spec, b in zip(deletion_vectors, blobs):
                ref, positions = spec[:2]
                dv_seq = spec[2] if len(spec) > 2 else None
                del_entries.append({
                    "status": STATUS_ADDED,
                    "snapshot_id": snapshot_id,
                    "sequence_number": dv_seq,
                    "data_file": {
                        "content": CONTENT_POSITION_DELETES,
                        "file_path": ppath,
                        "file_format": "PUFFIN",
                        "partition": {"lang": None},
                        "record_count": len(set(positions)),
                        "file_size_in_bytes": len(pblob),
                        "equality_ids": None,
                        "referenced_data_file": ref,
                        "content_offset": b["offset"],
                        "content_size_in_bytes": b["length"],
                    }})
        dmpath = "metadata/manifest-deletes.avro"
        dmblob = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, del_entries,
                           codec="deflate", sync_seed=9999)
        files[dmpath] = dmblob
        list_records.append(manifest_record(
            dmpath, dmblob, CONTENT_POSITION_DELETES,
            [{"status": STATUS_ADDED}] * len(del_entries),
            sequence_number=del_seq))
    files[f"metadata/snap-{snapshot_id}.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2, list_records, codec="deflate",
        sync_seed=snapshot_id + 1000)
    return files


def walk_snapshot_v2(files: dict[str, bytes],
                     snapshot_id: int = 1) -> dict:
    """Resolve a v2 (merge-on-read) snapshot: data manifests give
    the live file census; DELETES manifests point at positional
    delete parquet files whose (file_path, pos) rows are subtracted
    per data file — the ROW-ACCURATE live counts a v1-style walk
    over-reports.  Positions are validated against record_count and
    deduped; equality-delete files raise (their application needs
    the data rows, which a metadata walk never reads).

    Sequence-number scoping (table-spec "Scan Planning"): a
    positional delete applies only to data files whose data sequence
    number is <= the delete file's — entries inherit the manifest's
    ``sequence_number`` from the manifest list when their own is
    null, so rows added AFTER a delete commit are never dropped by
    it.

    v3 DELETION VECTORS (r16; table-spec v3 + Puffin spec): a
    delete entry with ``file_format`` PUFFIN /
    ``referenced_data_file`` set names ONE data file and a
    deletion-vector-v1 blob at [content_offset,
    +content_size_in_bytes) in its Puffin file; the blob's roaring
    positions subtract under the same sequence rule.  At most one
    DV per data file, and mixing a DV with parquet position-delete
    rows on the same file refuses (both per spec)."""
    list_path = f"metadata/snap-{snapshot_id}.avro"
    if list_path not in files:
        raise ValueError(f"missing manifest list {list_path}")
    mlist = read_ocf(files[list_path])["records"]
    live = []
    live_seqs: list[int] = []
    delete_paths = []
    dv_entries: list[tuple] = []
    data_idx = 0
    for mf in mlist:
        path = mf["manifest_path"]
        if path not in files:
            raise ValueError(f"missing manifest {path}")
        blob = files[path]
        if len(blob) != mf["manifest_length"]:
            raise ValueError(f"manifest length mismatch for {path}")
        mseq = mf.get("sequence_number")
        if not isinstance(mseq, int):
            raise ValueError(f"manifest {path} missing "
                             "sequence_number in manifest list")
        entries = read_ocf(blob)["records"]
        if mf.get("content", CONTENT_DATA) == CONTENT_DATA:
            for e in entries:
                if e["status"] == STATUS_DELETED:
                    continue
                df = e["data_file"]
                if df.get("content", CONTENT_DATA) != CONTENT_DATA:
                    raise ValueError("non-data file in data manifest")
                eseq = e.get("sequence_number")
                live.append({
                    "manifest_idx": data_idx,
                    "file_path": df["file_path"],
                    "file_format": df["file_format"],
                    "record_count": df["record_count"],
                    "file_size_in_bytes": df["file_size_in_bytes"],
                    "lang": df["partition"]["lang"],
                })
                live_seqs.append(eseq if eseq is not None else mseq)
            data_idx += 1
        else:
            for e in entries:
                if e["status"] == STATUS_DELETED:
                    continue
                df = e["data_file"]
                content = df.get("content")
                if content == CONTENT_EQUALITY_DELETES:
                    raise ValueError(
                        "equality deletes need data rows; a "
                        "metadata walk cannot apply them")
                if content != CONTENT_POSITION_DELETES:
                    raise ValueError("unexpected delete content")
                eseq = e.get("sequence_number")
                dseq = eseq if eseq is not None else mseq
                if df.get("referenced_data_file") is not None \
                        or df.get("file_format") == "PUFFIN":
                    # v3 DELETION VECTOR entry (table-spec v3 +
                    # Puffin spec): one blob in a Puffin file,
                    # covering exactly one data file
                    if df.get("referenced_data_file") is None \
                            or df.get("content_offset") is None \
                            or df.get("content_size_in_bytes") \
                            is None:
                        raise ValueError(
                            "deletion-vector entry missing "
                            "referenced_data_file/content_offset/"
                            "content_size_in_bytes")
                    dv_entries.append(
                        (df["referenced_data_file"],
                         df["file_path"],
                         df["content_offset"],
                         df["content_size_in_bytes"],
                         df["record_count"], dseq))
                    continue
                delete_paths.append(
                    (df["file_path"], df["record_count"], dseq))
    # (file_path, pos) -> newest delete-file sequence number
    deleted_by_file: dict[str, dict[int, int]] = {}
    n_delete_files = 0
    for dpath, rc, dseq in delete_paths:
        if dpath not in files:
            raise ValueError(f"missing delete file {dpath}")
        rows = read_positional_delete_parquet(files[dpath])
        if len(rows) != rc:
            raise ValueError("delete file record_count mismatch")
        n_delete_files += 1
        for fp, pos in rows:
            seen = deleted_by_file.setdefault(fp, {})
            seen[pos] = max(seen.get(pos, dseq), dseq)
    # v3 deletion vectors: at most ONE per data file, and a DV'd
    # data file must not also carry parquet position deletes (v3
    # forbids mixing the two forms)
    dv_by_file: dict[str, tuple[list[int], int]] = {}
    for ref, ppath, off, size, card, dseq in dv_entries:
        from .puffin import read_dv_at

        if ref in dv_by_file:
            raise ValueError(
                f"multiple deletion vectors for {ref}")
        if ref in deleted_by_file:
            raise ValueError(
                f"data file {ref} has both a deletion vector and "
                "position delete rows (v3 forbids mixing)")
        if ppath not in files:
            raise ValueError(f"missing puffin file {ppath}")
        positions = read_dv_at(files[ppath], off, size)
        if len(positions) != card:
            raise ValueError(
                "deletion vector cardinality mismatch")
        n_delete_files += 1
        dv_by_file[ref] = (positions, dseq)
    known = {f["file_path"] for f in live}
    for fp in set(deleted_by_file) | set(dv_by_file):
        if fp not in known:
            raise ValueError(f"delete targets unknown file {fp}")
    for f, fseq in zip(live, live_seqs):
        dels = deleted_by_file.get(f["file_path"], {})
        if dels and max(dels) >= f["record_count"]:
            raise ValueError("delete position beyond record_count")
        n_del = sum(1 for dseq in dels.values() if fseq <= dseq)
        dv = dv_by_file.get(f["file_path"])
        if dv is not None:
            positions, dseq = dv
            if positions and positions[-1] >= f["record_count"]:
                raise ValueError(
                    "delete position beyond record_count")
            if fseq <= dseq:
                n_del += len(positions)
        f["n_deleted"] = n_del
        f["live_records"] = f["record_count"] - n_del
    return {"n_manifests": data_idx,
            "n_delete_files": n_delete_files, "live": live}


def scan_snapshot_v2(files: dict[str, bytes],
                     snapshot_id: int = 1) -> dict:
    """FULL merge-on-read SCAN of a v2 snapshot — every byte decoded
    by this repo (no Arrow/Spark): data manifests -> data parquet
    files read row-by-row with the own page reader; positional
    delete files drop (file_path, pos); EQUALITY delete files (their
    ``equality_ids`` naming 1-based field ids of the table schema)
    drop every data row matching the delete row on those columns.
    Returns {n_data_files, columns, rows: [{file_path, _pos,
    <table columns>}]} of SURVIVING rows.

    Sequence-number scoping (table-spec "Scan Planning"): positional
    deletes apply to data files with data_seq <= delete_seq;
    equality deletes apply STRICTLY data_seq < delete_seq — a row
    (re-)inserted after the delete commit survives."""
    list_path = f"metadata/snap-{snapshot_id}.avro"
    if list_path not in files:
        raise ValueError(f"missing manifest list {list_path}")
    mlist = read_ocf(files[list_path])["records"]
    data_files: list[tuple[dict, int]] = []
    pos_deletes: list[tuple[str, int, int]] = []
    eq_deletes: list[tuple[list[int], dict[str, list], int]] = []
    for mf in mlist:
        path = mf["manifest_path"]
        if path not in files:
            raise ValueError(f"missing manifest {path}")
        blob = files[path]
        if len(blob) != mf["manifest_length"]:
            raise ValueError(f"manifest length mismatch for {path}")
        mseq = mf.get("sequence_number")
        if not isinstance(mseq, int):
            raise ValueError(f"manifest {path} missing "
                             "sequence_number in manifest list")
        for e in read_ocf(blob)["records"]:
            if e["status"] == STATUS_DELETED:
                continue
            df = e["data_file"]
            eseq = e.get("sequence_number")
            seq = eseq if eseq is not None else mseq
            content = df.get("content", CONTENT_DATA)
            if content == CONTENT_DATA:
                data_files.append((df, seq))
            elif content == CONTENT_POSITION_DELETES:
                if df.get("referenced_data_file") is not None \
                        or df.get("file_format") == "PUFFIN":
                    # v3 DELETION VECTOR: roaring positions for ONE
                    # data file, read at the manifest offset (r16;
                    # same scoping rule as parquet position rows)
                    from .puffin import read_dv_at

                    ref = df.get("referenced_data_file")
                    off = df.get("content_offset")
                    size = df.get("content_size_in_bytes")
                    if ref is None or off is None or size is None:
                        raise ValueError(
                            "deletion-vector entry missing "
                            "referenced_data_file/content_offset/"
                            "content_size_in_bytes")
                    if df["file_path"] not in files:
                        raise ValueError(
                            f"missing puffin file "
                            f"{df['file_path']}")
                    positions = read_dv_at(
                        files[df["file_path"]], off, size)
                    if len(positions) != df["record_count"]:
                        raise ValueError(
                            "deletion vector cardinality mismatch")
                    pos_deletes.extend(
                        (ref, pos, seq) for pos in positions)
                    continue
                if df["file_path"] not in files:
                    raise ValueError("missing positional delete file")
                rows = read_positional_delete_parquet(
                    files[df["file_path"]])
                if len(rows) != df["record_count"]:
                    raise ValueError(
                        "delete file record_count mismatch")
                pos_deletes.extend((fp, pos, seq)
                                   for fp, pos in rows)
            else:
                eq_ids = df.get("equality_ids")
                if not eq_ids:
                    raise ValueError(
                        "equality delete without equality_ids")
                if df["file_path"] not in files:
                    raise ValueError("missing equality delete file")
                cols = read_flat_parquet(files[df["file_path"]])
                n = len(next(iter(cols.values()), []))
                if n != df["record_count"]:
                    raise ValueError(
                        "equality delete record_count mismatch")
                eq_deletes.append((list(eq_ids), cols, seq))
    # (file_path, pos) -> newest delete sequence number
    dropped: dict[tuple[str, int], int] = {}
    for fp, pos, seq in pos_deletes:
        key = (fp, pos)
        dropped[key] = max(dropped.get(key, seq), seq)
    out_rows: list[dict] = []
    columns: list[str] = []
    for df, fseq in data_files:
        fp = df["file_path"]
        if fp not in files:
            raise ValueError(f"missing data file {fp}")
        cols = read_data_file(files[fp], df.get("file_format"))
        names = list(cols)
        columns = columns or names
        n = len(cols[names[0]]) if names else 0
        if n != df["record_count"]:
            raise ValueError("data file record_count mismatch")
        # equality keys: 1-based field id -> column position in the
        # table schema (the Iceberg field-id convention for a flat
        # top-level schema); strictly-newer deletes only
        eq_keysets = []
        for eq_ids, ecols, eseq in eq_deletes:
            if not fseq < eseq:
                continue
            enames = list(ecols)
            keycols = []
            for fid in eq_ids:
                if not 1 <= fid <= len(names):
                    raise ValueError("equality field id out of range")
                keycols.append(names[fid - 1])
            if sorted(enames) != sorted(keycols):
                raise ValueError(
                    "equality delete columns do not match ids")
            en = len(ecols[enames[0]])
            keys = {tuple(ecols[c][i] for c in keycols)
                    for i in range(en)}
            eq_keysets.append((keycols, keys))
        for pos in range(n):
            if dropped.get((fp, pos), fseq - 1) >= fseq:
                continue
            row = {c: cols[c][pos] for c in names}
            dead = False
            for keycols, keys in eq_keysets:
                if tuple(row[c] for c in keycols) in keys:
                    dead = True
                    break
            if dead:
                continue
            row["file_path"] = fp
            row["_pos"] = pos
            out_rows.append(row)
    return {"n_data_files": len(data_files), "columns": columns,
            "rows": out_rows}


_METADATA_RE = __import__("re").compile(r"^v(\d+)\.metadata\.json$")


def build_table_metadata(snapshots: dict[int, str],
                         current_snapshot_id: int, *,
                         version: int = 1,
                         table_uuid: str = "t",
                         partition_specs: list[dict] | None = None,
                         default_spec_id: int = 0) -> bytes:
    """{snapshot_id: manifest-list path} -> vN.metadata.json bytes
    (the table-spec TableMetadata subset a reader resolves).
    ``partition_specs`` carries the table's FULL spec history
    ([{spec-id, fields: [{name, transform, source-id, field-id}]}])
    — partition evolution keeps every old spec because existing
    manifests still reference them."""
    doc = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "current-snapshot-id": current_snapshot_id,
        "snapshots": [
            {"snapshot-id": sid, "manifest-list": path,
             "sequence-number": i + 1,
             "timestamp-ms": 1700000000000 + i}
            for i, (sid, path) in enumerate(sorted(
                snapshots.items()))
        ],
    }
    if partition_specs is not None:
        doc["partition-specs"] = partition_specs
        doc["default-spec-id"] = default_spec_id
    return json.dumps(doc, sort_keys=True,
                      separators=(",", ":")).encode("utf-8")


def resolve_table_metadata(files: dict[str, bytes]) -> dict:
    """Find the HIGHEST vN.metadata.json (the table's current
    metadata; older versions stay for time travel of the metadata
    log itself) -> {version, current_snapshot_id,
    snapshots: {id: manifest_list_path}}."""
    best = None
    for name in files:
        m = _METADATA_RE.match(name.rsplit("/", 1)[-1])
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), name)
    if best is None:
        raise ValueError("no vN.metadata.json in table")
    try:
        doc = json.loads(files[best[1]].decode("utf-8"))
    except ValueError as exc:
        raise ValueError("table metadata json malformed") from exc
    snaps = {}
    for s in doc.get("snapshots", []):
        sid, path = s.get("snapshot-id"), s.get("manifest-list")
        if not isinstance(sid, int) or not path:
            raise ValueError("malformed snapshot entry")
        snaps[sid] = path
    cur = doc.get("current-snapshot-id")
    if cur not in snaps:
        raise ValueError("current snapshot missing from snapshots")
    specs: dict[int, set] = {}
    for sp in doc.get("partition-specs") or []:
        sid2 = sp.get("spec-id")
        if not isinstance(sid2, int):
            raise ValueError("partition spec missing spec-id")
        specs[sid2] = {
            f["name"] for f in sp.get("fields") or []
            if f.get("transform") == "identity"}
    return {"version": best[0], "current_snapshot_id": cur,
            "snapshots": snaps, "partition_specs": specs,
            "default_spec_id": doc.get("default-spec-id", 0)}


def walk_snapshot_at(files: dict[str, bytes],
                     snapshot_id: int | None = None) -> dict:
    """Full resolution path: vN.metadata.json -> (requested or
    current) snapshot -> manifest list -> live census.  Passing a
    non-current snapshot_id IS time travel."""
    meta = resolve_table_metadata(files)
    sid = meta["current_snapshot_id"] if snapshot_id is None \
        else snapshot_id
    if sid not in meta["snapshots"]:
        raise ValueError(f"unknown snapshot id {sid}")
    out = walk_snapshot(files, sid,
                        list_path=meta["snapshots"][sid])
    out["snapshot_id"] = sid
    return out


def walk_snapshot(files: dict[str, bytes],
                  snapshot_id: int = 1,
                  list_path: str | None = None) -> dict:
    """Resolve a snapshot: read the manifest list, verify each
    manifest's recorded length, read its entries, and return the
    LIVE file census {n_manifests, live: [{manifest_idx, file_path,
    file_format, record_count, file_size_in_bytes, lang}]}."""
    if list_path is None:
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


def scan_plan_with_specs(files: dict[str, bytes], *,
                         snapshot_id: int = 1,
                         partition_eq: dict[str, object],
                         partition_specs: dict[int, set[str]]
                         ) -> dict:
    """PARTITION pruning under PARTITION-SPEC EVOLUTION (table-spec
    "Partition Evolution"): every manifest carries the
    ``partition_spec_id`` it was written under, and an equality
    predicate on a partition column may prune an entry ONLY when
    that manifest's spec identity-transforms the column — files
    written under an older spec (where the column wasn't a
    partition field) must be KEPT and filtered row-wise, because
    their partition tuple says nothing about the column.  A spec-
    covered entry with a null partition value is likewise kept
    (absence may not prune).  ``partition_specs`` maps spec-id ->
    identity partition field names (resolve_table_metadata supplies
    it).  Returns {candidates, n_total, n_skipped,
    n_unprunable_old_spec}."""
    list_path = f"metadata/snap-{snapshot_id}.avro"
    if list_path not in files:
        raise ValueError(f"missing manifest list {list_path}")
    from ..sources.avro_ocf import read_ocf

    candidates = []
    n_total = 0
    n_old = 0
    for mf in read_ocf(files[list_path])["records"]:
        if mf.get("content", CONTENT_DATA) != CONTENT_DATA:
            continue
        spec_id = mf.get("partition_spec_id")
        if spec_id is None or spec_id not in partition_specs:
            raise ValueError(
                f"manifest {mf.get('manifest_path')!r} carries "
                f"unknown partition spec {spec_id!r}")
        spec_fields = partition_specs[spec_id]
        path = mf["manifest_path"]
        if path not in files:
            raise ValueError(f"missing manifest {path}")
        for e in read_ocf(files[path])["records"]:
            if e["status"] == STATUS_DELETED:
                continue
            df = e["data_file"]
            if df.get("content", CONTENT_DATA) != CONTENT_DATA:
                continue
            n_total += 1
            part = df.get("partition") or {}
            keep = True
            covered = True
            for col, want in partition_eq.items():
                if col not in spec_fields:
                    covered = False
                    continue  # old spec: the tuple can't speak
                got = part.get(col)
                if got is None:
                    continue  # null partition value: may not prune
                if got != want:
                    keep = False
                    break
            if keep:
                if not covered:
                    n_old += 1
                candidates.append(df)
    return {"candidates": candidates, "n_total": n_total,
            "n_skipped": n_total - len(candidates),
            "n_unprunable_old_spec": n_old}


def expire_snapshots(files: dict[str, bytes],
                     keep_ids: set[int]) -> dict:
    """SNAPSHOT EXPIRY (table-spec maintenance; the metadata half of
    what engines run as ``expireSnapshots``): write a new
    vN+1.metadata.json containing only ``keep_ids`` and compute the
    now-unreachable members — expired snapshots' manifest lists,
    manifests referenced by no kept snapshot, and data files
    referenced (under ANY status, including DELETED tombstone
    entries — conservatism over reclaim) by no surviving manifest.
    The current snapshot must be kept.  Returns {files: updated
    dict (metadata added, orphans removed), deleted: sorted orphan
    names, kept_snapshots, n_expired}."""
    from ..sources.avro_ocf import read_ocf

    meta = resolve_table_metadata(files)
    if meta["current_snapshot_id"] not in keep_ids:
        raise ValueError("cannot expire the current snapshot")
    unknown = keep_ids - set(meta["snapshots"])
    if unknown:
        raise ValueError(f"unknown snapshot ids {sorted(unknown)}")

    def reachable_of(snapshot_ids, required: bool) -> set[str]:
        # ADVICE r15: a KEPT snapshot with a missing manifest
        # list/manifest is corrupt -> the module's ValueError
        # contract, not a bare KeyError; an EXPIRED snapshot's
        # missing member (partially-expired log, hostile input) is
        # already-reclaimed -> skip it, the expiry must not abort
        out: set[str] = set()
        for sid in snapshot_ids:
            list_path = meta["snapshots"][sid]
            out.add(list_path)
            if list_path not in files:
                if required:
                    raise ValueError(
                        f"kept snapshot {sid} is missing its "
                        f"manifest list {list_path!r}")
                continue
            for mf in read_ocf(files[list_path])["records"]:
                mpath = mf["manifest_path"]
                out.add(mpath)
                if mpath not in files:
                    if required:
                        raise ValueError(
                            f"kept snapshot {sid} is missing "
                            f"manifest {mpath!r}")
                    continue
                for e in read_ocf(files[mpath])["records"]:
                    out.add(e["data_file"]["file_path"])
        return out

    kept_reach = reachable_of(sorted(keep_ids), required=True)
    expired_ids = sorted(set(meta["snapshots"]) - keep_ids)
    expired_reach = reachable_of(expired_ids, required=False)
    orphans = sorted(p for p in expired_reach - kept_reach
                     if p in files)
    doc = json.loads(
        files[f"metadata/v{meta['version']}.metadata.json"]
        if f"metadata/v{meta['version']}.metadata.json" in files
        else next(files[n] for n in files
                  if n.endswith(f"v{meta['version']}.metadata.json"))
    )
    doc["snapshots"] = [s for s in doc.get("snapshots", [])
                        if s.get("snapshot-id") in keep_ids]
    new_files = {n: b for n, b in files.items() if n not in orphans}
    new_version = meta["version"] + 1
    new_files[f"metadata/v{new_version}.metadata.json"] = json.dumps(
        doc, sort_keys=True, separators=(",", ":")).encode("utf-8")
    return {"files": new_files, "deleted": orphans,
            "kept_snapshots": sorted(keep_ids),
            "n_expired": len(expired_ids)}


def rewrite_manifests(files: dict[str, bytes],
                      snapshot_id: int = 1) -> dict:
    """MANIFEST COMPACTION (the spec's rewrite-manifests table
    service): many small data manifests — the natural product of
    streaming fast-appends — are merged into ONE, carrying every
    live entry forward as STATUS_EXISTING with its resolved data
    sequence number made EXPLICIT (entries inherited the old
    manifest's sequence number from the manifest list; the rewrite
    must pin it per-entry or delete scoping breaks).  Delete
    manifests pass through untouched.  Writes a new manifest list
    and vN+1 metadata; returns {files: updated dict, n_before,
    n_after, new_snapshot_id}.

    At 100 TB this is what keeps scan PLANNING O(live files), not
    O(commits): a thousand 10-entry manifests cost a thousand
    object reads per plan; one 10k-entry manifest costs one."""
    from ..sources.avro_ocf import read_ocf, write_ocf

    list_path = f"metadata/snap-{snapshot_id}.avro"
    if list_path not in files:
        raise ValueError(f"missing manifest list {list_path}")
    mlist = read_ocf(files[list_path])["records"]
    merged_entries = []
    delete_records = []
    n_before = 0
    for mf in mlist:
        path = mf["manifest_path"]
        if path not in files:
            raise ValueError(f"missing manifest {path}")
        if mf.get("content", CONTENT_DATA) != CONTENT_DATA:
            delete_records.append(mf)
            continue
        n_before += 1
        mseq = mf.get("sequence_number")
        if not isinstance(mseq, int):
            raise ValueError(f"manifest {path} missing "
                             "sequence_number in manifest list")
        for e in read_ocf(files[path])["records"]:
            if e["status"] == STATUS_DELETED:
                continue  # tombstones do not survive a rewrite
            eseq = e.get("sequence_number")
            merged_entries.append({
                "status": STATUS_EXISTING,
                "snapshot_id": e.get("snapshot_id"),
                "sequence_number": (eseq if eseq is not None
                                    else mseq),
                "data_file": e["data_file"],
            })
    if n_before == 0:
        raise ValueError("no data manifests to rewrite")
    merged_entries.sort(
        key=lambda e: e["data_file"]["file_path"])
    new_sid = snapshot_id + 1
    mpath = f"metadata/manifest-rewrite-{new_sid}.avro"
    blob = write_ocf(MANIFEST_ENTRY_SCHEMA_V2, merged_entries,
                     codec="deflate", sync_seed=new_sid)
    # the merged manifest's list-level sequence number is 0; every
    # entry carries its own explicit number, so inheritance never
    # fires for them
    records = [{
        "manifest_path": mpath, "manifest_length": len(blob),
        "partition_spec_id": 0, "content": CONTENT_DATA,
        "sequence_number": 0, "added_snapshot_id": new_sid,
        "added_files_count": 0,
        "existing_files_count": len(merged_entries),
        "deleted_files_count": 0,
    }] + delete_records
    new_files = dict(files)
    new_files[mpath] = blob
    new_files[f"metadata/snap-{new_sid}.avro"] = write_ocf(
        MANIFEST_LIST_SCHEMA_V2, records, codec="deflate",
        sync_seed=1000 + new_sid)
    # metadata json is optional on the way in (build_snapshot_v2
    # payloads address snapshots by filename); the rewrite always
    # writes one out so the new snapshot is the table's current
    try:
        meta = resolve_table_metadata(files)
        snaps = dict(meta["snapshots"])
        new_version = meta["version"] + 1
    except ValueError:
        snaps = {snapshot_id: list_path}
        new_version = 1
    snaps[new_sid] = f"metadata/snap-{new_sid}.avro"
    new_files[f"metadata/v{new_version}.metadata.json"] = \
        build_table_metadata(snaps, new_sid)
    return {"files": new_files, "n_before": n_before,
            "n_after": 1, "new_snapshot_id": new_sid}
