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


def reconstruct_table(files: dict[str, bytes]) -> dict:
    """{member name: bytes} of a ``.hoodie/`` dir -> copy-on-write
    state at the latest completed instant: {latest_instant,
    n_completed, n_pending, live: {(partition, file_id): {path,
    num_writes, instant}}}."""
    instants = []
    for name, blob in files.items():
        info = parse_instant_filename(name)
        if info is None:
            continue
        info["blob"] = blob
        instants.append(info)
    if len(instants) > MAX_INSTANTS:
        raise ValueError("hudi instant cap exceeded")
    completed = sorted(
        (i for i in instants if i["state"] == COMPLETED
         and i["action"] in ("commit", "deltacommit",
                             "replacecommit")),
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
