"""Export the commit log as a Delta-Lake-compatible ``_delta_log``.

The ``_log/`` layout (versioning/log.py) is already manifest-shaped —
immutable parquet data directories + JSON snapshots — which is exactly
the information a Delta Lake transaction log carries.  This module
materializes that mapping so external engines that speak the open Delta
protocol (Spark+delta, Trino, DuckDB's delta extension, …) can read a
dataset branch without knowing anything about muller_spark:

    <root>/_delta_log/00000000000000000000.json   version 0 actions
    <root>/_delta_log/0000...0001.json            version 1 actions
    ...

One Delta version per commit on the branch's first-parent chain, oldest
first.  Append-only commits emit ``add`` actions for the new delta
directory's files; rewrites emit ``remove`` for every file of the
parent state plus ``add`` for the new state — the same semantics the
engine's own readers apply.  Actions follow the public Delta protocol
(protocol / metaData / add / remove JSON lines, minReader 1 /
minWriter 2).

Export is one-way interop (snapshot publish): muller_spark remains the
writer of record; re-export after new commits overwrites the log with
the extended version chain.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid as uuidlib

from muller_spark.fs import get_fs


def _data_files(fs, root: str, rel_dir: str) -> list[tuple[str, int]]:
    """(relative_path, size) for every parquet part file in a data dir."""
    out = []
    abs_dir = os.path.join(root, rel_dir)
    if not fs.isdir(abs_dir):
        return out
    for name in sorted(fs.listdir(abs_dir)):
        if name.endswith(".parquet"):
            path = os.path.join(abs_dir, name)
            try:
                size = os.path.getsize(path)
            except OSError:
                size = 0
            out.append((os.path.join(rel_dir, name).replace(os.sep, "/"), size))
    return out


def export_delta_log(ds, branch: str | None = None) -> str:
    """Write ``<root>/_delta_log`` covering the branch's first-parent
    history; returns the log directory path."""
    log = ds.log
    fs = get_fs(ds.path)
    head = log.resolve(branch or ds.branch or ds.commit_id)
    chain = list(reversed(log.log(head.commit_id)))  # root → head

    delta_dir = os.path.join(ds.path, "_delta_log")
    if fs.isdir(delta_dir):
        fs.rmtree(delta_dir)
    fs.makedirs(delta_dir)

    # stable digest, not builtin hash(): PYTHONHASHSEED salts hash() per
    # process, and Delta readers cache table identity by metaData.id — a
    # re-export must produce the same id for the same table
    table_id = str(uuidlib.UUID(hashlib.md5(ds.path.encode("utf-8")).hexdigest()))
    prev_files: list[tuple[str, int]] = []
    for version, snap in enumerate(chain):
        actions = []
        if version == 0:
            actions.append({
                "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}
            })
        # metaData on version 0 and again whenever the schema changed
        emit_meta = version == 0 or (
            snap.schema_json != chain[version - 1].schema_json
        )
        if emit_meta and snap.schema_json:
            actions.append({
                "metaData": {
                    "id": table_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": snap.schema_json,
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": int(snap.timestamp * 1000),
                }
            })
        cur_files = []
        for rel_dir in snap.data_dirs:
            cur_files.extend(_data_files(fs, ds.path, rel_dir))
        prev_set = {p for p, _ in prev_files}
        cur_set = {p for p, _ in cur_files}
        ts_ms = int(snap.timestamp * 1000)
        for path, _size in prev_files:
            if path not in cur_set:
                actions.append({
                    "remove": {
                        "path": path,
                        "deletionTimestamp": ts_ms,
                        "dataChange": True,
                    }
                })
        for path, size in cur_files:
            if path not in prev_set:
                actions.append({
                    "add": {
                        "path": path,
                        "partitionValues": {},
                        "size": size,
                        "modificationTime": ts_ms,
                        "dataChange": True,
                    }
                })
        actions.append({
            "commitInfo": {
                "timestamp": ts_ms,
                "operation": "WRITE" if version else "CREATE TABLE",
                "operationParameters": {},
                "engineInfo": "muller_spark delta export",
                "muller": {"commit_id": snap.commit_id, "message": snap.message},
            }
        })
        fs.write_text(
            os.path.join(delta_dir, f"{version:020d}.json"),
            "\n".join(json.dumps(a) for a in actions) + "\n",
        )
        prev_files = cur_files
    return delta_dir
