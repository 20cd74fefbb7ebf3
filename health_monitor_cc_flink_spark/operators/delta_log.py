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


def commit_filename(version: int) -> str:
    return f"{version:020d}.json"


def parse_commit_filename(name: str) -> int | None:
    """'<20-digit version>.json' -> version, else None (checkpoints
    and CRC sidecars are not commits)."""
    m = _COMMIT_RE.match(name.rsplit("/", 1)[-1])
    return int(m.group(1)) if m else None


def build_delta_log(commits: dict[int, list[dict]]) -> dict[str, bytes]:
    """{version: [action dicts]} -> {filename: ndjson bytes}."""
    return {
        commit_filename(v): ("\n".join(
            json.dumps(a, sort_keys=True, separators=(",", ":"))
            for a in actions) + "\n").encode("utf-8")
        for v, actions in commits.items()
    }


def replay_delta_log(commits: dict[int, list[dict]]) -> dict:
    """Replay commits in version order -> {version, live: {path:
    {size, partition_values, num_records}}, n_adds, n_removes,
    metadata}."""
    if not commits:
        raise ValueError("empty delta log")
    if len(commits) > MAX_COMMITS:
        raise ValueError("delta log commit cap exceeded")
    versions = sorted(commits)
    if versions[0] != 0 or versions[-1] != len(versions) - 1:
        raise ValueError("delta log has version gaps")
    live: dict[str, dict] = {}
    metadata: dict | None = None
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
                }
                n_adds += 1
                if len(live) > MAX_FILES:
                    raise ValueError("delta live-file cap exceeded")
            elif "remove" in action:
                live.pop(action["remove"]["path"], None)
                n_removes += 1
            elif "metaData" in action:
                metadata = action["metaData"]
            # protocol / commitInfo / txn: carried, no file effect
    return {
        "version": versions[-1],
        "live": live,
        "n_adds": n_adds,
        "n_removes": n_removes,
        "metadata": metadata,
    }


def parse_delta_log_files(files: dict[str, bytes]) -> dict:
    """{filename: ndjson bytes} (e.g. an untarred _delta_log/) ->
    replayed snapshot; non-commit members ignored."""
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
    return replay_delta_log(commits)
