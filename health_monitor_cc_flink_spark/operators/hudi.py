"""Apache Hudi timeline walk — the third lake table format.

Hudi (PUBLIC spec at hudi.apache.org, storage layout of every 0.x/1.x
release) keeps table state as a TIMELINE under ``.hoodie/``: instant
files named ``<instant_time>.<action>[.<state>]`` — the action is
commit / deltacommit / replacecommit / clean / rollback, and a file
with no state suffix (or ``.completed``) is COMPLETED while
``.requested`` / ``.inflight`` instants are in progress and must be
IGNORED by readers.  A completed commit's JSON carries
``partitionToWriteStats`` (per partition, the written base files:
fileId, path, numWrites, ...); a replacecommit additionally carries
``partitionToReplaceFileIds`` — clustering/overwrite replaces whole
FILE GROUPS.

Copy-on-write state reconstruction = for every file group (partition,
fileId), the base file written by the LATEST completed instant, minus
groups replaced by a later replacecommit.  That's ``reconstruct_table``
here; base-file names follow ``<fileId>_<writeToken>_<instant>.parquet``.

Hostile input raises ``ValueError``.
"""

from __future__ import annotations

import json
import re

MAX_INSTANTS = 1 << 16

_INSTANT_RE = re.compile(
    r"^(\d{8,17})\.(commit|deltacommit|replacecommit|clean|rollback)"
    r"(?:\.(requested|inflight))?$")

COMPLETED = "completed"


def parse_instant_filename(name: str) -> dict | None:
    """'.hoodie/<time>.<action>[.<state>]' -> {time, action, state}
    or None for non-instant members (hoodie.properties, aux dirs)."""
    m = _INSTANT_RE.match(name.rsplit("/", 1)[-1])
    if not m:
        return None
    return {
        "time": m.group(1),
        "action": m.group(2),
        "state": m.group(3) or COMPLETED,
    }


def base_file_name(file_id: str, instant: str,
                   write_token: str = "0-1-0") -> str:
    return f"{file_id}_{write_token}_{instant}.parquet"


def build_commit(partition_stats: dict[str, list[dict]],
                 replaced: dict[str, list[str]] | None = None) -> bytes:
    """{partition: [{fileId, path, numWrites, totalWriteBytes}]}
    (+ replaced file ids for replacecommits) -> commit JSON bytes."""
    doc = {"partitionToWriteStats": partition_stats,
           "operationType": "UPSERT"}
    if replaced is not None:
        doc["partitionToReplaceFileIds"] = replaced
    return json.dumps(doc, sort_keys=True,
                      separators=(",", ":")).encode("utf-8")




def _rolled_back_targets(instants: list[dict]) -> set[str]:
    """Completed ``rollback`` instants name the commits they undid
    (HoodieRollbackMetadata's ``commitsRollback`` list; the
    instantsRollback [{action, commitTime}] form is accepted too).
    Readers must skip the targeted instants even when their files
    still exist on the timeline."""
    targets: set[str] = set()
    for inst in instants:
        if inst["action"] != "rollback" \
                or inst["state"] != COMPLETED:
            continue
        try:
            doc = json.loads(inst["blob"].decode("utf-8"))
        except ValueError as exc:
            raise ValueError("hudi rollback json malformed") from exc
        if not isinstance(doc, dict):
            raise ValueError("hudi rollback json malformed")
        for t in doc.get("commitsRollback") or []:
            targets.add(str(t))
        for e in doc.get("instantsRollback") or []:
            if isinstance(e, dict) and e.get("commitTime"):
                targets.add(str(e["commitTime"]))
    return targets


def reconstruct_table(files: dict[str, bytes],
                      as_of: str | None = None) -> dict:
    """{member name: bytes} of a ``.hoodie/`` dir -> copy-on-write
    state at the latest completed instant: {latest_instant,
    n_completed, n_pending, live: {(partition, file_id): {path,
    num_writes, instant}}}.  ``as_of`` gives TIME TRAVEL: only
    completed instants with time <= as_of participate (the
    as-of-instant query every lake engine exposes); rollbacks are
    honored regardless of their own time, matching Hudi — a
    rollback ERASES its target from history rather than appending
    to it."""
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
                             "replacecommit")
         and i["time"] not in rolled_back
         and (as_of is None or i["time"] <= as_of)),
        key=lambda i: i["time"])
    if not completed:
        raise ValueError("hudi timeline has no completed commits")
    times = [i["time"] for i in completed]
    if len(set(times)) != len(times):
        raise ValueError("duplicate hudi instant times")
    n_pending = sum(1 for i in instants if i["state"] != COMPLETED)
    live: dict[tuple, dict] = {}
    for inst in completed:
        try:
            doc = json.loads(inst["blob"].decode("utf-8"))
        except ValueError as exc:
            raise ValueError("hudi commit json malformed") from exc
        if not isinstance(doc, dict):
            raise ValueError("hudi commit json malformed")
        for part, fids in (doc.get("partitionToReplaceFileIds")
                           or {}).items():
            for fid in fids:
                live.pop((part, fid), None)
        for part, stats in (doc.get("partitionToWriteStats")
                            or {}).items():
            for st in stats:
                fid = st.get("fileId")
                if not fid:
                    raise ValueError("write stat missing fileId")
                live[(part, fid)] = {
                    "path": st.get("path"),
                    "num_writes": st.get("numWrites"),
                    "instant": inst["time"],
                }
    return {
        "latest_instant": completed[-1]["time"],
        "n_completed": len(completed),
        "n_pending": n_pending,
        "live": live,
    }


def reconstruct_mor_table(files: dict[str, bytes],
                          as_of: str | None = None) -> dict:
    """MERGE-ON-READ state reconstruction: like
    ``reconstruct_table`` but each file group resolves to its BASE
    file plus the ORDERED chain of log files appended by
    deltacommits after the base instant.

    Walking completed instants ascending: a ``commit`` /
    ``replacecommit`` write stat whose path is a base file
    (``.parquet``) replaces the group's base AND folds away log
    files at or before that instant — exactly what a compaction
    commit does; a ``deltacommit`` stat whose path is a log file
    (``<fileId>_<base>.log.<v>_<token>``) appends to the group's
    chain; ``partitionToReplaceFileIds`` still drops whole groups;
    pending instants stay invisible.  Returns {latest_instant,
    n_completed, n_pending, live: {(partition, file_id): {base_path,
    base_instant, log_paths: [...], n_log_files}}}."""
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
                             "replacecommit")
         and i["time"] not in rolled_back
         and (as_of is None or i["time"] <= as_of)),
        key=lambda i: i["time"])
    if not completed:
        raise ValueError("hudi timeline has no completed commits")
    times = [i["time"] for i in completed]
    if len(set(times)) != len(times):
        raise ValueError("duplicate hudi instant times")
    n_pending = sum(1 for i in instants if i["state"] != COMPLETED)
    live: dict[tuple, dict] = {}
    for inst in completed:
        try:
            doc = json.loads(inst["blob"].decode("utf-8"))
        except ValueError as exc:
            raise ValueError("hudi commit json malformed") from exc
        if not isinstance(doc, dict):
            raise ValueError("hudi commit json malformed")
        for part, fids in (doc.get("partitionToReplaceFileIds")
                           or {}).items():
            for fid in fids:
                live.pop((part, fid), None)
        for part, stats in (doc.get("partitionToWriteStats")
                            or {}).items():
            for st in stats:
                fid = st.get("fileId")
                path = st.get("path") or ""
                if not fid:
                    raise ValueError("write stat missing fileId")
                g = live.setdefault((part, fid), {
                    "base_path": None, "base_instant": None,
                    "log_paths": []})
                if path.endswith(".parquet"):
                    if inst["action"] == "deltacommit":
                        raise ValueError(
                            "deltacommit may not write base files")
                    g["base_path"] = path
                    g["base_instant"] = inst["time"]
                    # compaction folds the chain up to this instant
                    g["log_paths"] = [
                        (t, p) for t, p in g["log_paths"]
                        if t > inst["time"]]
                else:
                    from .hudi_log import parse_log_file_name

                    if parse_log_file_name(path) is None:
                        raise ValueError(
                            f"write stat path {path!r} is neither "
                            "base nor log file")
                    if inst["action"] != "deltacommit":
                        raise ValueError(
                            "log appends must ride deltacommits")
                    g["log_paths"].append((inst["time"], path))
    out_live = {}
    for key, g in live.items():
        if g["base_path"] is None and not g["log_paths"]:
            continue
        out_live[key] = {
            "base_path": g["base_path"],
            "base_instant": g["base_instant"],
            "log_paths": [p for _, p in sorted(g["log_paths"])],
            "n_log_files": len(g["log_paths"]),
        }
    return {
        "latest_instant": completed[-1]["time"],
        "n_completed": len(completed),
        "n_pending": n_pending,
        "live": out_live,
    }


def plan_clean(files: dict[str, bytes],
               retain_versions: int = 1) -> dict:
    """CLEANER planning (Hudi 'clean' table service, KEEP_LATEST_
    FILE_VERSIONS policy): per file group, base-file versions beyond
    the newest ``retain_versions`` are reclaimable — upserts write a
    NEW base file version per commit and the old versions exist only
    to serve time-travel/incremental readers until cleaned.  Walks
    the same visible timeline as ``reconstruct_table`` (completed,
    non-rolled-back; pending invisible) and returns {candidates:
    {partition: [paths oldest-first]}, n_retained, clean_metadata}
    where clean_metadata is the HoodieCleanMetadata dict
    (partitionMetadata.successDeleteFiles) ready to commit as a
    ``<t>.clean`` instant — the exact doc the metadata-table builder
    consumes to tombstone the reclaimed files.

    Replaced file groups are NOT candidates: the replacecommit
    already logically deleted them; cleaning their bytes is the
    expire path, not version retention."""
    if retain_versions < 1:
        raise ValueError("retain_versions must be >= 1")
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
                             "replacecommit")
         and i["time"] not in rolled_back),
        key=lambda i: i["time"])
    if not completed:
        raise ValueError("hudi timeline has no completed commits")
    # (partition, fileId) -> [(instant, path)] in time order;
    # replaced groups drop out entirely
    versions: dict[tuple, list] = {}
    for inst in completed:
        try:
            doc = json.loads(inst["blob"].decode("utf-8"))
        except ValueError as exc:
            raise ValueError("hudi commit json malformed") from exc
        if not isinstance(doc, dict):
            raise ValueError("hudi commit json malformed")
        for part, fids in (doc.get("partitionToReplaceFileIds")
                           or {}).items():
            for fid in fids:
                versions.pop((part, fid), None)
        for part, stats in (doc.get("partitionToWriteStats")
                            or {}).items():
            for st in stats:
                fid = st.get("fileId")
                path = st.get("path") or ""
                if not fid:
                    raise ValueError("write stat missing fileId")
                if not path.endswith(".parquet"):
                    continue  # log appends are compaction's problem
                versions.setdefault((part, fid), []).append(
                    (inst["time"], path))
    candidates: dict[str, list] = {}
    n_retained = 0
    for (part, _fid), vs in sorted(versions.items()):
        vs.sort()
        old = vs[:-retain_versions]
        n_retained += min(len(vs), retain_versions)
        for _t, path in old:
            candidates.setdefault(part, []).append(path)
    clean_metadata = {
        "startCleanTime": completed[-1]["time"],
        "policy": "KEEP_LATEST_FILE_VERSIONS",
        "partitionMetadata": {
            part: {"partitionPath": part,
                   "successDeleteFiles": paths,
                   "failedDeleteFiles": []}
            for part, paths in sorted(candidates.items())},
    }
    return {"candidates": candidates, "n_retained": n_retained,
            "clean_metadata": clean_metadata}
