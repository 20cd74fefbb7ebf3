"""Delta Lake transaction-log replay — lake TABLE format support.

A 100 TB lake is not loose parquet: it's table formats whose state
lives in a metadata log.  Delta Lake's log (PUBLIC protocol spec,
delta-io PROTOCOL.md) is a ``_delta_log/`` directory of zero-padded
``<version>.json`` commits, each a sequence of newline-delimited JSON
ACTIONS; the table's live-file snapshot is the LOG REPLAY:

* ``add``    — file becomes live (path, partitionValues, size,
  stats JSON with numRecords); re-adding an existing path replaces
  its entry (last writer wins);
* ``remove`` — tombstones a path;
* ``metaData`` / ``protocol`` / ``commitInfo`` — table-level actions
  (schema string, reader/writer versions) carried along, not files.

``replay_delta_log`` takes ``{version: [action, ...]}``, applies
commits in version order (gaps rejected — a missing commit means an
incomplete log), and returns the live snapshot.  ``build_delta_log``
writes the commit files deterministically for the synth, packaged by
the caller (the registry query ships them inside this repo's ustar
builder, exactly how a log directory travels in a corpus dump).

Hostile input raises ``ValueError``.
"""

from __future__ import annotations

import json
import re

MAX_COMMITS = 1 << 16
MAX_FILES = 1 << 20

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(
    r"^(\d{20})\.checkpoint(?:\.(\d{10})\.(\d{10}))?\.parquet$")
#: V2 ("UUID-named") checkpoints, PROTOCOL.md "V2 Spec Checkpoints":
#: <v>.checkpoint.<uuid>.{parquet,json} — a MANIFEST holding
#: checkpointMetadata/protocol/metaData plus sidecar actions whose
#: files (under _sidecars/) carry the add rows
_CHECKPOINT_V2_RE = re.compile(
    r"^(\d{20})\.checkpoint\.([0-9a-fA-F-]{36})\.(parquet|json)$")


def commit_filename(version: int) -> str:
    return f"{version:020d}.json"


def parse_commit_filename(name: str) -> int | None:
    """'<20-digit version>.json' -> version, else None (checkpoints
    and CRC sidecars are not commits)."""
    m = _COMMIT_RE.match(name.rsplit("/", 1)[-1])
    return int(m.group(1)) if m else None


def checkpoint_filename(version: int, part: int | None = None,
                        total: int | None = None) -> str:
    if part is None:
        return f"{version:020d}.checkpoint.parquet"
    return (f"{version:020d}.checkpoint."
            f"{part:010d}.{total:010d}.parquet")


def parse_checkpoint_filename(name: str) -> tuple | None:
    """'<v>.checkpoint.parquet' -> (version, 1, 1);
    '<v>.checkpoint.<i>.<n>.parquet' (multi-part) -> (version, i, n);
    else None."""
    m = _CHECKPOINT_RE.match(name.rsplit("/", 1)[-1])
    if not m:
        return None
    v = int(m.group(1))
    if m.group(2) is None:
        return v, 1, 1
    return v, int(m.group(2)), int(m.group(3))


def build_delta_log(commits: dict[int, list[dict]]) -> dict[str, bytes]:
    """{version: [action dicts]} -> {filename: ndjson bytes}."""
    return {
        commit_filename(v): ("\n".join(
            json.dumps(a, sort_keys=True, separators=(",", ":"))
            for a in actions) + "\n").encode("utf-8")
        for v, actions in commits.items()
    }


def read_checkpoint_parquet(parts: list[bytes]) -> dict:
    """Decode checkpoint parquet part(s) with THIS repo's parquet
    page reader (no Arrow/Spark in the loop) -> {live, metadata,
    n_actions}.  A checkpoint row is one action: its ``add`` struct
    seeds the live set (tombstone ``remove`` rows are expired-file
    bookkeeping, not live state); ``metaData`` carries the schema.
    Struct presence is keyed on the required child (add.path /
    remove.path / metaData.id non-null)."""
    from .parquet_data import read_column_chunk
    from .parquet_meta import parse_footer

    live: dict[str, dict] = {}
    metadata: dict | None = None
    protocol: dict | None = None
    sidecars: list[dict] = []
    checkpoint_metadata: dict | None = None
    n_actions = 0
    for data in parts:
        m = parse_footer(data)
        leaves = {l["path"]: l for l in m["schema_leaves"]}

        def col(path, m=m, leaves=leaves, data=data):
            leaf = leaves.get(path)
            if leaf is None:
                return None
            vals: list = []
            for rg in m["row_groups"]:
                cc = next((c for c in rg["columns"]
                           if c["path"] == path), None)
                if cc is None:
                    raise ValueError(
                        f"checkpoint column {path} missing")
                start = (cc["dictionary_page_offset"]
                         or cc["data_page_offset"])
                vals.extend(read_column_chunk(
                    data, start_offset=start,
                    num_values=cc["num_values"],
                    ptype=cc["type"], codec=cc["codec"],
                    max_def_level=leaf["max_def_level"],
                    max_rep_level=leaf["max_rep_level"],
                    rep_def_level=leaf["rep_def_level"],
                    type_length=leaf["type_length"]))
            return vals

        n = m["num_rows"]
        n_actions += n
        add_path = col("add.path") or [None] * n
        add_size = col("add.size") or [None] * n
        add_stats = col("add.stats") or [None] * n
        pv_keys = (col("add.partitionValues.key_value.key")
                   or [None] * n)
        pv_vals = (col("add.partitionValues.key_value.value")
                   or [None] * n)
        dv_st = (col("add.deletionVector.storageType")
                 or [None] * n)
        dv_pod = (col("add.deletionVector.pathOrInlineDv")
                  or [None] * n)
        dv_off = col("add.deletionVector.offset") or [None] * n
        dv_sz = (col("add.deletionVector.sizeInBytes")
                 or [None] * n)
        dv_card = (col("add.deletionVector.cardinality")
                   or [None] * n)
        meta_id = col("metaData.id") or [None] * n
        # protocol action: a checkpoint row whose protocol struct is
        # non-null.  Dropping it (pre-r16) meant a checkpoint-seeded
        # snapshot reported protocol None and check_read_protocol
        # waved a features table through as "legacy v1" (ADVICE r15).
        proto_v = col("protocol.minReaderVersion") or [None] * n
        proto_w = col("protocol.minWriterVersion") or [None] * n
        proto_rf = (col("protocol.readerFeatures.list.element")
                    or [None] * n)
        proto_wf = (col("protocol.writerFeatures.list.element")
                    or [None] * n)
        # V2 checkpoints (PROTOCOL.md "V2 Spec Checkpoints"): the
        # manifest carries sidecar actions whose file bytes hold the
        # add rows
        sc_path = col("sidecar.path") or [None] * n
        sc_size = col("sidecar.sizeInBytes") or [None] * n
        ckm_v = col("checkpointMetadata.version") or [None] * n
        for i in range(n):
            if ckm_v[i] is not None:
                checkpoint_metadata = {"version": ckm_v[i]}
            if proto_v[i] is not None:
                protocol = {"minReaderVersion": proto_v[i]}
                if proto_w[i] is not None:
                    protocol["minWriterVersion"] = proto_w[i]
                if proto_rf[i] is not None:
                    protocol["readerFeatures"] = [
                        _u(f) for f in proto_rf[i]]
                if proto_wf[i] is not None:
                    protocol["writerFeatures"] = [
                        _u(f) for f in proto_wf[i]]
            if sc_path[i] is not None:
                sidecars.append({"path": _u(sc_path[i]),
                                 "sizeInBytes": sc_size[i]})
            if add_path[i] is not None:
                stats = json.loads(
                    (add_stats[i] or b"{}").decode("utf-8")
                    if isinstance(add_stats[i], (bytes, bytearray))
                    else add_stats[i] or "{}")
                keys = pv_keys[i] or []
                vals_i = pv_vals[i] or []
                pv = {
                    _u(k): _u(v) for k, v in zip(keys, vals_i)
                }
                dv = None
                if dv_st[i] is not None:
                    dv = {"storageType": _u(dv_st[i]),
                          "pathOrInlineDv": _u(dv_pod[i]),
                          "sizeInBytes": dv_sz[i],
                          "cardinality": dv_card[i]}
                    if dv_off[i] is not None:
                        dv["offset"] = dv_off[i]
                live[_u(add_path[i])] = {
                    "size": add_size[i],
                    "partition_values": pv,
                    "num_records": stats.get("numRecords"),
                    "stats": stats or None,
                    "deletion_vector": dv,
                }
                if len(live) > MAX_FILES:
                    raise ValueError("delta live-file cap exceeded")
            elif meta_id[i] is not None:
                metadata = {"id": _u(meta_id[i])}
    return {"live": live, "metadata": metadata,
            "protocol": protocol, "sidecars": sidecars,
            "checkpoint_metadata": checkpoint_metadata,
            "n_actions": n_actions}


def _u(v):
    return (v.decode("utf-8")
            if isinstance(v, (bytes, bytearray)) else v)


def replay_delta_log(commits: dict[int, list[dict]],
                     base: dict | None = None,
                     base_version: int | None = None) -> dict:
    """Replay commits in version order -> {version, live: {path:
    {size, partition_values, num_records}}, n_adds, n_removes,
    metadata}.  With ``base``/``base_version`` (a checkpoint
    snapshot), only commits AFTER base_version apply — they must be
    contiguous from base_version+1; older commits (not yet vacuumed)
    are already reflected in the checkpoint and are ignored."""
    if base is None and not commits:
        raise ValueError("empty delta log")
    if len(commits) > MAX_COMMITS:
        raise ValueError("delta log commit cap exceeded")
    if base is not None:
        if base_version is None:
            raise ValueError("checkpoint base requires base_version")
        commits = {v: a for v, a in commits.items()
                   if v > base_version}
        versions = sorted(commits)
        if versions and (
                versions[0] != base_version + 1
                or versions[-1] != base_version + len(versions)):
            raise ValueError("delta log has version gaps after "
                             "checkpoint")
        live = dict(base["live"])
        metadata = base.get("metadata")
        protocol = base.get("protocol")
    else:
        versions = sorted(commits)
        if versions[0] != 0 or versions[-1] != len(versions) - 1:
            raise ValueError("delta log has version gaps")
        live = {}
        metadata = None
        protocol = None
    n_adds = n_removes = 0
    for v in versions:
        for action in commits[v]:
            if not isinstance(action, dict):
                raise ValueError("delta action is not an object")
            if "add" in action:
                a = action["add"]
                stats = json.loads(a.get("stats") or "{}")
                live[a["path"]] = {
                    "size": a.get("size"),
                    "partition_values": a.get("partitionValues") or {},
                    "num_records": stats.get("numRecords"),
                    "stats": stats or None,
                    "deletion_vector": a.get("deletionVector"),
                }
                n_adds += 1
                if len(live) > MAX_FILES:
                    raise ValueError("delta live-file cap exceeded")
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
                n_removes += 1
            elif "metaData" in action:
                metadata = action["metaData"]
            elif "protocol" in action:
                protocol = action["protocol"]
            # commitInfo / txn: carried, no file effect
    return {
        "version": versions[-1] if versions else base_version,
        "live": live,
        "n_adds": n_adds,
        "n_removes": n_removes,
        "metadata": metadata,
        "protocol": protocol,
    }


def build_dv_file(dv_blobs: list[bytes]) -> tuple[bytes, list[int]]:
    """Serialized bitmap arrays -> an on-disk deletion-vector .bin
    (PROTOCOL.md DV storage format: 1-byte version, then per DV a
    4-byte big-endian size, the data, and a big-endian CRC-32 of the
    data) plus each DV's offset (pointing at its size word)."""
    import zlib

    out = bytearray(b"\x01")
    offsets = []
    for blob in dv_blobs:
        offsets.append(len(out))
        out += len(blob).to_bytes(4, "big")
        out += blob
        out += (zlib.crc32(blob) & 0xFFFFFFFF).to_bytes(4, "big")
    return bytes(out), offsets


def read_dv_from_file(data: bytes, offset: int,
                      size_in_bytes: int) -> bytes:
    import zlib

    if not data or data[0] != 1:
        raise ValueError("unsupported deletion vector file version")
    if offset < 1 or offset + 4 > len(data):
        raise ValueError("deletion vector offset out of range")
    size = int.from_bytes(data[offset:offset + 4], "big")
    if size != size_in_bytes:
        raise ValueError("deletion vector size mismatch")
    body_end = offset + 4 + size
    if body_end + 4 > len(data):
        raise ValueError("deletion vector overruns file")
    blob = data[offset + 4:body_end]
    want = int.from_bytes(data[body_end:body_end + 4], "big")
    if (zlib.crc32(blob) & 0xFFFFFFFF) != want:
        raise ValueError("deletion vector checksum mismatch")
    return blob


def resolve_deletion_vector(desc: dict,
                            files: dict[str, bytes]) -> list[int]:
    """DeletionVectorDescriptor -> sorted deleted row indexes.

    storageType 'i': pathOrInlineDv is the Z85 of the serialized
    bitmap (zero-padded to a 4-byte multiple; sizeInBytes restores
    the true length).  'u': the last 20 chars are the Z85 of the
    16-byte UUID, any preceding chars a directory prefix; the file
    is <prefix>/deletion_vector_<uuid>.bin.  'p': an explicit
    relative path.  The decoded cardinality must match the
    descriptor's."""
    from .roaring import deserialize_bitmap_array, z85_decode

    st = desc.get("storageType")
    pod = desc.get("pathOrInlineDv", "")
    size = desc.get("sizeInBytes")
    if st == "i":
        raw = z85_decode(pod)
        if size is None or not 0 <= size <= len(raw) < size + 4:
            raise ValueError("inline deletion vector size mismatch")
        blob = raw[:size]
    elif st in ("u", "p"):
        if st == "u":
            import uuid as _uuid

            if len(pod) < 20:
                raise ValueError("uuid deletion vector path short")
            prefix, uu = pod[:-20], pod[-20:]
            name = (f"deletion_vector_"
                    f"{_uuid.UUID(bytes=z85_decode(uu))}.bin")
            path = f"{prefix}/{name}" if prefix else name
        else:
            path = pod
        by_base = {n.rsplit("/", 1)[-1]: n for n in files}
        full = path if path in files else by_base.get(
            path.rsplit("/", 1)[-1])
        if full is None:
            raise ValueError(f"deletion vector file {path} missing")
        blob = read_dv_from_file(files[full], desc.get("offset", 1),
                                 size)
    else:
        raise ValueError(f"deletion vector storage {st!r} unknown")
    rows = deserialize_bitmap_array(blob)
    if desc.get("cardinality") != len(rows):
        raise ValueError("deletion vector cardinality mismatch")
    return rows


def prune_live_by_stats(live: dict[str, dict], column: str,
                        lo, hi) -> dict:
    """Delta DATA SKIPPING from add.stats alone — the planner step
    that runs before any data file opens: keep files whose
    minValues/maxValues for ``column`` intersect [lo, hi]; files
    without stats for the column are kept (absence may not prune).
    Returns {candidates: [paths], n_total, n_skipped};
    O(live census), data untouched."""
    candidates = []
    for path in sorted(live):
        st = live[path].get("stats") or {}
        mn = (st.get("minValues") or {}).get(column)
        mx = (st.get("maxValues") or {}).get(column)
        try:
            if mn is not None and mn > hi:
                continue
            if mx is not None and mx < lo:
                continue
        except TypeError:
            # stats value and query bound of incomparable types
            # (string-typed stats vs numeric bounds, or stats
            # serialized as strings): the documented conservatism —
            # absence (or unusability) of stats may never prune —
            # keeps the file (ADVICE r14)
            pass
        candidates.append(path)
    return {"candidates": candidates, "n_total": len(live),
            "n_skipped": len(live) - len(candidates)}


def write_checkpoint_parquet(snapshot: dict) -> tuple[bytes, int]:
    """Snapshot census -> checkpoint parquet bytes via THIS repo's
    own parquet writer (nested protocol/metaData/add structs; one
    row per action) + the action count for ``_last_checkpoint``.
    Partitioned tables are refused — this compactor covers the
    unpartitioned shape; deletion-vector entries serialize as the
    2-deep ``add.deletionVector.*`` struct (r14: the nested writer
    made the shape expressible — a DV-less add row carries a
    GroupNull(1) at the deletionVector group, an inline descriptor
    a null ``offset`` leaf)."""
    from .parquet_write import GROUP_NULL, GroupNull, write_parquet

    live = snapshot["live"]
    paths = sorted(live)
    n = 2 + len(paths)  # protocol + metaData + adds
    G = GROUP_NULL
    meta_id = (snapshot.get("metadata") or {}).get("id") or "table"
    cols = _protocol_cols(snapshot, n)
    cols += [
        ("metaData.id", "STRING",
         [G, meta_id] + [G] * len(paths)),
    ]
    cols += _add_action_cols(paths, live, lead=2)
    return write_parquet(cols), n


def _protocol_cols(snapshot: dict, n: int) -> list[tuple]:
    """protocol.* manifest columns for n total rows (row 0 is the
    protocol action).  The snapshot's ACTUAL protocol rides along —
    pre-r16 this hardcoded 1/2, silently downgrading a features
    table on compaction; a checkpoint-seeded reader then carries it
    through replay into check_read_protocol."""
    from .parquet_write import GROUP_NULL as G

    proto = snapshot.get("protocol") or {}
    cols = [
        ("protocol.minReaderVersion", "INT64",
         [proto.get("minReaderVersion", 1)] + [G] * (n - 1)),
        ("protocol.minWriterVersion", "INT64",
         [proto.get("minWriterVersion", 2)] + [G] * (n - 1)),
    ]
    if proto.get("readerFeatures") is not None:
        cols.append(("protocol.readerFeatures", "LIST_STRING",
                     [sorted(proto["readerFeatures"])]
                     + [G] * (n - 1)))
    if proto.get("writerFeatures") is not None:
        cols.append(("protocol.writerFeatures", "LIST_STRING",
                     [sorted(proto["writerFeatures"])]
                     + [G] * (n - 1)))
    return cols


def _add_action_cols(paths: list[str], live: dict,
                     lead: int = 0) -> list[tuple]:
    """add.* checkpoint columns for ``paths`` preceded by ``lead``
    non-add rows (GroupNull at the add struct)."""
    from .parquet_write import GROUP_NULL, GroupNull

    G = GROUP_NULL
    pre = [G] * lead

    def dv_col(field):
        out = []
        for p in paths:
            desc = live[p].get("deletion_vector")
            if not desc:
                out.append(GroupNull(1))  # add present, DV group null
            else:
                out.append(desc.get(field))
        return out

    has_dv = any(live[p].get("deletion_vector") for p in paths)
    cols = [
        ("add.path", "STRING", pre + paths),
        ("add.size", "INT64",
         pre + [live[p].get("size") for p in paths]),
        ("add.stats", "STRING",
         pre + [
             json.dumps(live[p]["stats"], sort_keys=True,
                        separators=(",", ":"))
             if live[p].get("stats")
             else (None if live[p].get("num_records") is None
                   else json.dumps(
                       {"numRecords": live[p]["num_records"]},
                       separators=(",", ":")))
             for p in paths]),
    ]
    if any(live[p].get("partition_values") for p in paths):
        # partitioned tables (r16: the nested-MAP writer made the
        # spec's add.partitionValues map expressible; the reader
        # already decoded it)
        cols.append((
            "add.partitionValues", "MAP_STRING_STRING",
            pre + [dict(live[p].get("partition_values") or {})
                   for p in paths]))
    if has_dv:
        cols += [
            ("add.deletionVector.storageType", "STRING",
             pre + dv_col("storageType")),
            ("add.deletionVector.pathOrInlineDv", "STRING",
             pre + dv_col("pathOrInlineDv")),
            ("add.deletionVector.offset", "INT64",
             pre + dv_col("offset")),
            ("add.deletionVector.sizeInBytes", "INT64",
             pre + dv_col("sizeInBytes")),
            ("add.deletionVector.cardinality", "INT64",
             pre + dv_col("cardinality")),
        ]
    return cols


def write_checkpoint_v2(snapshot: dict, uuid: str,
                        n_sidecars: int = 2) -> dict[str, bytes]:
    """V2 ("UUID-named") checkpoint writer, PROTOCOL.md "V2 Spec
    Checkpoints": the checkpoint splits into a MANIFEST
    (``<v>.checkpoint.<uuid>.parquet`` — checkpointMetadata,
    protocol, metaData and one ``sidecar`` action per sidecar file)
    plus sidecar parquets under ``_delta_log/_sidecars/`` carrying
    the add rows round-robin.  At 100 TB the sidecar split is what
    lets a cluster read the file census in PARALLEL — one task per
    sidecar — instead of single-streaming one giant checkpoint.
    Returns {relative filename: bytes} including
    ``_last_checkpoint``."""
    from .parquet_write import GROUP_NULL, write_parquet

    live = snapshot["live"]
    v = snapshot["version"]
    G = GROUP_NULL
    meta_id = (snapshot.get("metadata") or {}).get("id") or "table"
    paths = sorted(live)
    n_sidecars = max(1, min(n_sidecars, max(1, len(paths))))
    shards = [paths[i::n_sidecars] for i in range(n_sidecars)]
    out: dict[str, bytes] = {}
    sidecar_names = []
    n_actions = 0
    for i, shard in enumerate(shards):
        blob = write_parquet(_add_action_cols(shard, live))
        name = f"{uuid}-{i:03d}.parquet"
        out[f"_sidecars/{name}"] = blob
        sidecar_names.append(name)
        n_actions += len(shard)
    # manifest rows: checkpointMetadata, protocol, metaData, sidecars
    n = 3 + len(sidecar_names)
    cols = [("checkpointMetadata.version", "INT64",
             [v] + [G] * (n - 1))]
    proto_cols = _protocol_cols(snapshot, n - 1)
    cols += [(name, t, [G] + vals)
             for name, t, vals in proto_cols]
    cols += [
        ("metaData.id", "STRING",
         [G, G, meta_id] + [G] * len(sidecar_names)),
        ("sidecar.path", "STRING",
         [G, G, G] + sidecar_names),
        ("sidecar.sizeInBytes", "INT64",
         [G, G, G] + [len(out[f"_sidecars/{s}"])
                      for s in sidecar_names]),
    ]
    out[f"{v:020d}.checkpoint.{uuid}.parquet"] = write_parquet(cols)
    n_actions += n
    out["_last_checkpoint"] = json.dumps(
        {"version": v, "size": n_actions},
        separators=(",", ":")).encode("utf-8")
    return out


def compact_delta_log(files: dict[str, bytes], *,
                      v2: bool = False,
                      n_sidecars: int = 2) -> dict[str, bytes]:
    """LOG COMPACTION: replay a ``_delta_log/`` (JSON commits and/or
    an existing checkpoint), write a fresh single-part checkpoint at
    the latest version with the OWN parquet writer, and return the
    compacted log — checkpoint + ``_last_checkpoint`` only, early
    commits vacuumed.  Replaying the compacted log must equal
    replaying the original (the round-trip the registry query
    gates).

    ``v2=True`` emits the V2 (UUID-named, sidecar) form instead —
    the manifest's UUID derives deterministically from the snapshot
    census so compaction stays reproducible byte-for-byte."""
    snap = parse_delta_log_files(files)
    v = snap["version"]
    if v2:
        import hashlib

        h = hashlib.md5(
            ("|".join(sorted(snap["live"]))
             + f"@{v}").encode("utf-8")).hexdigest()
        uuid = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        return write_checkpoint_v2(snap, uuid,
                                   n_sidecars=n_sidecars)
    blob, n_actions = write_checkpoint_parquet(snap)
    return {
        checkpoint_filename(v): blob,
        "_last_checkpoint": json.dumps(
            {"version": v, "size": n_actions},
            separators=(",", ":")).encode("utf-8"),
    }


def parse_last_checkpoint(blob: bytes) -> dict:
    """``_last_checkpoint`` JSON -> {version, size, parts}."""
    d = json.loads(blob.decode("utf-8"))
    if not isinstance(d, dict) or not isinstance(
            d.get("version"), int) or d["version"] < 0:
        raise ValueError("bad _last_checkpoint")
    return {"version": d["version"], "size": d.get("size"),
            "parts": d.get("parts")}


def delta_history(commits: dict[int, list[dict]]) -> list[dict]:
    """Time travel: the snapshot census AT EVERY version — one
    incremental replay pass, O(total actions), not O(V) full
    replays.  Returns [{version, n_live, n_adds, n_removes}]."""
    if not commits:
        raise ValueError("empty delta log")
    versions = sorted(commits)
    if versions[0] != 0 or versions[-1] != len(versions) - 1:
        raise ValueError("delta log has version gaps")
    live: dict = {}
    n_adds = n_removes = 0
    out = []
    for v in versions:
        snap = replay_delta_log(
            {v: commits[v]},
            base={"live": live, "metadata": None},
            base_version=v - 1)
        live = snap["live"]
        n_adds += snap["n_adds"]
        n_removes += snap["n_removes"]
        out.append({"version": v, "n_live": len(live),
                    "n_adds": n_adds, "n_removes": n_removes})
    return out


def read_checkpoint_json(blob: bytes) -> dict:
    """A V2 checkpoint MANIFEST in its JSON form (the spec allows
    either encoding): ndjson action lines, same result shape as
    ``read_checkpoint_parquet``."""
    live: dict[str, dict] = {}
    metadata = protocol = checkpoint_metadata = None
    sidecars: list[dict] = []
    n_actions = 0
    for line in blob.decode("utf-8").splitlines():
        if not line.strip():
            continue
        action = json.loads(line)
        if not isinstance(action, dict):
            raise ValueError("checkpoint action is not an object")
        n_actions += 1
        if "add" in action:
            a = action["add"]
            stats = json.loads(a.get("stats") or "{}")
            live[a["path"]] = {
                "size": a.get("size"),
                "partition_values": a.get("partitionValues") or {},
                "num_records": stats.get("numRecords"),
                "stats": stats or None,
                "deletion_vector": a.get("deletionVector"),
            }
            if len(live) > MAX_FILES:
                raise ValueError("delta live-file cap exceeded")
        elif "metaData" in action:
            metadata = action["metaData"]
        elif "protocol" in action:
            protocol = action["protocol"]
        elif "sidecar" in action:
            s = action["sidecar"]
            sidecars.append({"path": s["path"],
                             "sizeInBytes": s.get("sizeInBytes")})
        elif "checkpointMetadata" in action:
            checkpoint_metadata = action["checkpointMetadata"]
        # remove: expired-file tombstone, not live state
    return {"live": live, "metadata": metadata,
            "protocol": protocol, "sidecars": sidecars,
            "checkpoint_metadata": checkpoint_metadata,
            "n_actions": n_actions}


def _resolve_sidecar(files: dict[str, bytes], path: str) -> bytes:
    """Sidecar paths are relative to ``_delta_log/_sidecars/``
    (PROTOCOL.md); accept that member under any log-root prefix."""
    suffix = "_sidecars/" + path
    for full, blob in files.items():
        if full == suffix or full.endswith("/" + suffix):
            return blob
    raise ValueError(f"missing sidecar file {path}")


def parse_delta_log_files(files: dict[str, bytes]) -> dict:
    """{filename: bytes} (e.g. an untarred ``_delta_log/``) ->
    replayed snapshot; non-commit members ignored.

    When ``_last_checkpoint`` is present, the snapshot seeds from the
    referenced ``<v>.checkpoint[.<i>.<n>].parquet`` part(s) — decoded
    with this repo's own parquet page reader — and only JSON commits
    AFTER the checkpoint version replay; commits at or before it may
    have been VACUUMED (replay-from-zero would be impossible, and is
    O(all commits) even when possible).  Multi-part checkpoints
    concatenate row-wise; a missing part raises.

    V2 ("UUID-named") checkpoints (PROTOCOL.md "V2 Spec
    Checkpoints", r16): a ``<v>.checkpoint.<uuid>.{parquet,json}``
    MANIFEST at the referenced version is preferred over classic
    parts; its checkpointMetadata.version must equal the filename
    version, and its ``sidecar`` actions pull add rows from
    ``_sidecars/<name>`` members.  After replay the snapshot's
    protocol gates the read (check_read_protocol) BEFORE deletion
    vectors resolve — pre-r16 only the dedicated protocol-gate query
    enforced it (ADVICE r15)."""
    base = base_version = None
    names = {n.rsplit("/", 1)[-1]: n for n in files}
    if "_last_checkpoint" in names:
        lc = parse_last_checkpoint(files[names["_last_checkpoint"]])
        base_version = lc["version"]
        v2_manifest = None
        for short, full in names.items():
            m = _CHECKPOINT_V2_RE.match(short)
            if m and int(m.group(1)) == base_version:
                v2_manifest = (files[full], m.group(3))
                break
        parts_found: dict[int, tuple[int, bytes]] = {}
        for short, full in names.items():
            cp = parse_checkpoint_filename(short)
            if cp and cp[0] == base_version:
                parts_found[cp[1]] = (cp[2], files[full])
        if v2_manifest is not None:
            blob, kind = v2_manifest
            base = (read_checkpoint_parquet([blob])
                    if kind == "parquet"
                    else read_checkpoint_json(blob))
            ckm = base.get("checkpoint_metadata")
            if ckm is None or ckm.get("version") != base_version:
                raise ValueError(
                    "v2 checkpoint manifest lacks a matching "
                    "checkpointMetadata.version")
            for sc in base.get("sidecars") or []:
                sc_blob = _resolve_sidecar(files, sc["path"])
                if sc["sizeInBytes"] is not None \
                        and len(sc_blob) != sc["sizeInBytes"]:
                    raise ValueError(
                        f"sidecar {sc['path']} size mismatch")
                part = read_checkpoint_parquet([sc_blob])
                dup = set(part["live"]) & set(base["live"])
                if dup:
                    raise ValueError(
                        f"path in multiple sidecars: {sorted(dup)[0]}")
                base["live"].update(part["live"])
                base["n_actions"] += part["n_actions"]
                if len(base["live"]) > MAX_FILES:
                    raise ValueError("delta live-file cap exceeded")
            if lc["size"] is not None \
                    and base["n_actions"] != lc["size"]:
                raise ValueError("_last_checkpoint size mismatch")
        elif not parts_found:
            # _last_checkpoint is a HINT (delta protocol): with no
            # matching parquet, fall back to plain JSON replay —
            # which still raises if the early commits were vacuumed
            base_version = None
        else:
            totals = {t for t, _ in parts_found.values()}
            if len(totals) != 1 or sorted(parts_found) != list(
                    range(1, totals.pop() + 1)):
                raise ValueError("incomplete multi-part checkpoint")
            base = read_checkpoint_parquet(
                [parts_found[i][1] for i in sorted(parts_found)])
            if lc["size"] is not None \
                    and base["n_actions"] != lc["size"]:
                raise ValueError("_last_checkpoint size mismatch")
    commits: dict[int, list[dict]] = {}
    for name, blob in files.items():
        v = parse_commit_filename(name)
        if v is None:
            continue
        actions = []
        for line in blob.decode("utf-8").splitlines():
            if line.strip():
                actions.append(json.loads(line))
        commits[v] = actions
    snap = replay_delta_log(commits, base=base,
                            base_version=base_version)
    snap["checkpoint_version"] = base_version
    # forward-compatibility gate ON THE READ PATH (ADVICE r15): a
    # table advertising reader features this engine lacks must
    # refuse here, not only in the dedicated protocol-gate query —
    # silently unapplied features corrupt results
    check_read_protocol(snap.get("protocol"))
    # merge-on-read: resolve each live file's deletion vector so the
    # snapshot reports ROW-ACCURATE live counts
    for entry in snap["live"].values():
        desc = entry.get("deletion_vector")
        if not desc:
            entry["dv_cardinality"] = 0
            entry["live_records"] = entry["num_records"]
            continue
        rows = resolve_deletion_vector(desc, files)
        nr = entry["num_records"]
        if nr is not None and rows and rows[-1] >= nr:
            raise ValueError("deleted row index beyond numRecords")
        entry["dv_cardinality"] = len(rows)
        entry["live_records"] = (None if nr is None
                                 else nr - len(rows))
    return snap


def column_mapping(metadata: dict | None) -> dict | None:
    """COLUMN MAPPING resolution (Delta protocol "Column Mapping"):
    when the metaData action's configuration sets
    ``delta.columnMapping.mode`` to ``name`` or ``id``, parquet data
    files carry PHYSICAL column names (``col-<uuid>`` style) and the
    logical->physical map lives in the schemaString field metadata
    (``delta.columnMapping.physicalName`` / ``.id``) — renames and
    drops become metadata-only operations.  Returns {mode,
    physical: {logical dotted path: physical name}, ids: {logical:
    field id}} or None when mapping is off.  A mapped mode with a
    field missing its physicalName is corrupt -> ValueError."""
    if not metadata:
        return None
    conf = metadata.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode")
    if mode in (None, "none"):
        return None
    if mode not in ("name", "id"):
        raise ValueError(f"unknown column mapping mode {mode!r}")
    try:
        schema = json.loads(metadata["schemaString"])
    except (KeyError, ValueError) as exc:
        raise ValueError("column mapping without a readable "
                         "schemaString") from exc
    physical: dict[str, str] = {}
    ids: dict[str, int] = {}

    def walk(fields, prefix: str) -> None:
        if not isinstance(fields, list):
            raise ValueError("schemaString fields malformed")
        for f in fields:
            md = f.get("metadata") or {}
            logical = prefix + f["name"]
            phys = md.get("delta.columnMapping.physicalName")
            if phys is None:
                raise ValueError(
                    f"mode {mode!r} but field {logical!r} lacks "
                    "delta.columnMapping.physicalName")
            physical[logical] = phys
            fid = md.get("delta.columnMapping.id")
            if fid is not None:
                ids[logical] = int(fid)
            t = f.get("type")
            if isinstance(t, dict) and t.get("type") == "struct":
                walk(t.get("fields"), logical + ".")

    walk(schema.get("fields") or [], "")
    return {"mode": mode, "physical": physical, "ids": ids}


def read_cdf(commits: dict[int, list[dict]], lo: int, hi: int,
             read_file) -> list[dict]:
    """CHANGE DATA FEED read over a version range (protocol "Change
    Data Feed"): per commit, if any ``cdc`` action is present its
    ``_change_data/`` files carry the authoritative change rows
    (with their ``_change_type`` column — update_preimage /
    update_postimage / delete / insert); commits WITHOUT cdc
    actions derive changes from the data actions — every row of a
    ``dataChange`` add is an insert, every row of a ``dataChange``
    remove a delete (the insert-only / delete-only shortcut real
    writers use to avoid doubling bytes).  ``read_file(path) ->
    {column: values}`` supplies file contents (the own parquet
    reader at the call site).  Returns [{version, change_type,
    columns}] in version order; a cdc file without a _change_type
    column is corrupt -> ValueError."""
    out: list[dict] = []
    for v in sorted(commits):
        if not lo <= v <= hi:
            continue
        actions = commits[v]
        cdcs = [a["cdc"] for a in actions
                if isinstance(a, dict) and "cdc" in a]
        if cdcs:
            for c in cdcs:
                cols = read_file(c["path"])
                types = cols.get("_change_type")
                if types is None:
                    raise ValueError(
                        "cdc file lacks _change_type column")
                data = {k: vals for k, vals in cols.items()
                        if k != "_change_type"}
                for t in sorted(set(types)):
                    idx = [i for i, x in enumerate(types) if x == t]
                    out.append({
                        "version": v,
                        "change_type": t.decode("utf-8")
                        if isinstance(t, (bytes, bytearray)) else t,
                        "columns": {k: [vals[i] for i in idx]
                                    for k, vals in data.items()},
                    })
            continue
        for a in actions:
            if "add" in a and a["add"].get("dataChange"):
                out.append({"version": v, "change_type": "insert",
                            "columns": read_file(a["add"]["path"])})
            elif "remove" in a and a["remove"].get("dataChange"):
                out.append({
                    "version": v, "change_type": "delete",
                    "columns": read_file(a["remove"]["path"])})
    return out


#: reader features THIS engine actually implements (DV replay since
#: r13, column mapping since r15); anything else must refuse
SUPPORTED_READER_FEATURES = frozenset(
    {"deletionVectors", "columnMapping", "v2Checkpoint"})


def check_read_protocol(protocol: dict | None) -> None:
    """The protocol action's FORWARD-COMPATIBILITY contract
    (PROTOCOL.md "Protocol Evolution"): a reader seeing
    minReaderVersion 3 must understand EVERY listed readerFeature,
    and must refuse any higher version outright — silently reading
    a table whose features it doesn't implement returns wrong data
    (unapplied deletion vectors, unmapped columns), which is
    strictly worse than failing.  No protocol action means legacy
    version 1."""
    if protocol is None:
        return
    v = protocol.get("minReaderVersion", 1)
    if v in (1, 2):
        return
    if v == 3:
        feats = set(protocol.get("readerFeatures") or [])
        unsupported = sorted(feats - SUPPORTED_READER_FEATURES)
        if unsupported:
            raise ValueError(
                f"unsupported Delta reader features {unsupported}; "
                "refusing to read (unapplied features corrupt "
                "results silently)")
        return
    raise ValueError(
        f"unsupported Delta minReaderVersion {v}; refusing to read")


def write_version_checksum(snapshot: dict) -> bytes:
    """VERSION CHECKSUM (``<v>.crc``) — the per-commit state summary
    delta-spark writes next to every commit so a reader can VERIFY
    its reconstructed snapshot without re-listing data files:
    tableSizeBytes / numFiles over the live set, numDeletedRecords
    and numDeletionVectors over the DV state, plus the metadata and
    protocol actions in force.  Field names follow the public
    VersionChecksum shape."""
    live = snapshot["live"]
    doc = {
        "tableSizeBytes": sum(
            int(e.get("size") or 0) for e in live.values()),
        "numFiles": len(live),
        "numDeletedRecordsOpt": sum(
            int(e.get("dv_cardinality")
                or (e.get("deletion_vector") or {})
                .get("cardinality") or 0)
            for e in live.values()),
        "numDeletionVectorsOpt": sum(
            1 for e in live.values()
            if e.get("deletion_vector")),
        "numMetadata": 1,
        "numProtocol": 1,
        "metadata": snapshot.get("metadata"),
        "protocol": snapshot.get("protocol")
        or {"minReaderVersion": 1, "minWriterVersion": 2},
    }
    return json.dumps(doc, sort_keys=True,
                      separators=(",", ":")).encode("utf-8")


def checksum_filename(version: int) -> str:
    return f"{version:020d}.crc"


def verify_version_checksum(files: dict[str, bytes]) -> dict:
    """Verify every ``<v>.crc`` in a log directory against the
    REPLAYED snapshot at that version: recompute the summary and
    diff field-by-field.  Returns {versions_checked, valid,
    mismatches: [{version, field, expected, actual}]} — the cheap
    state-integrity pass engines run on snapshot load; a stale or
    tampered checksum is reported, never silently accepted."""
    crc_re = re.compile(r"^(\d{20})\.crc$")
    commits: dict[int, list[dict]] = {}
    for name, blob in files.items():
        v = parse_commit_filename(name)
        if v is None:
            continue
        commits[v] = [json.loads(line)
                      for line in blob.decode("utf-8").splitlines()
                      if line.strip()]
    checked = 0
    mismatches = []
    for name, blob in sorted(files.items()):
        m = crc_re.match(name.rsplit("/", 1)[-1])
        if not m:
            continue
        v = int(m.group(1))
        if v not in commits:
            raise ValueError(
                f"checksum {name} has no commit at version {v}")
        try:
            stated = json.loads(blob.decode("utf-8"))
        except ValueError as exc:
            raise ValueError(
                f"checksum {name} json malformed") from exc
        snap = replay_delta_log(
            {k: a for k, a in commits.items() if k <= v})
        want = json.loads(
            write_version_checksum(snap).decode("utf-8"))
        checked += 1
        for field in ("tableSizeBytes", "numFiles",
                      "numDeletedRecordsOpt",
                      "numDeletionVectorsOpt", "protocol"):
            if stated.get(field) != want.get(field):
                mismatches.append({
                    "version": v, "field": field,
                    "expected": want.get(field),
                    "actual": stated.get(field)})
    return {"versions_checked": checked,
            "valid": not mismatches,
            "mismatches": mismatches}


def vacuum_delta(files: dict[str, bytes], *,
                 retention_ms: int,
                 now_ms: int) -> dict:
    """VACUUM (the delta-spark maintenance command): physically
    remove data files tombstoned longer than the retention window.
    Eligibility = named by a ``remove`` action whose
    ``deletionTimestamp`` predates ``now_ms - retention_ms``, AND
    not currently live (a later re-add RESCUES the path — vacuuming
    it would corrupt the current snapshot), AND actually present in
    the payload.  Tombstones younger than the window stay so
    concurrent readers of recent snapshots don't lose files from
    under them — the same reason delta-spark refuses retention
    below its safety default.  A remove without a
    deletionTimestamp never qualifies (unknown age -> conservative
    keep).  Returns {files: updated dict, deleted: sorted names,
    n_kept_tombstones}.  Time travel to versions BEFORE the horizon
    is broken by design — that is what vacuum is."""
    if retention_ms < 0:
        raise ValueError("retention_ms must be >= 0")
    commits: dict[int, list[dict]] = {}
    for name, blob in files.items():
        v = parse_commit_filename(name)
        if v is None:
            continue
        commits[v] = [json.loads(line)
                      for line in blob.decode("utf-8").splitlines()
                      if line.strip()]
    if not commits:
        raise ValueError("empty delta log")
    snap = replay_delta_log(commits)
    horizon = now_ms - retention_ms
    eligible: set[str] = set()
    kept = 0
    for v in sorted(commits):
        for action in commits[v]:
            if "remove" not in action:
                continue
            r = action["remove"]
            path = r.get("path")
            ts = r.get("deletionTimestamp")
            if path is None:
                raise ValueError("remove action missing path")
            if path in snap["live"]:
                continue  # re-added: rescued
            if ts is None or ts >= horizon:
                kept += 1
                continue
            eligible.add(path)
    deleted = sorted(p for p in eligible if p in files)
    return {
        "files": {n: b for n, b in files.items()
                  if n not in deleted},
        "deleted": deleted,
        "n_kept_tombstones": kept,
    }
