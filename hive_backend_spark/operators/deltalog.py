"""Delta-style transaction-log replay — the lakehouse METADATA operation
that decides what a 100 TB table even IS before any scan: an append-only
directory of versioned JSON action files (`_delta_log/<version>.json`,
each line one action: protocol / metaData / add / remove), whose replay
(latest-wins by file path, remove tombstones dropping earlier adds)
yields the live-file snapshot at any version — time travel is replaying a
prefix. Built from the PUBLIC Delta Lake transaction-log protocol
(delta.io PROTOCOL.md); pure stdlib JSON + arithmetic.

Scope:
  - actions: ``protocol`` (min reader/writer versions), ``metaData``
    (table id, schema string, partition columns), ``add`` (path, size,
    partitionValues, dataChange, stats JSON with numRecords), ``remove``
    (path, deletionTimestamp) — the churn subset every log carries;
  - replay semantics: within one version file actions apply in order;
    across versions ascending; an ``add`` for a path replaces any prior
    add of that path (latest wins); a ``remove`` tombstones it; a later
    re-``add`` resurrects it — the upsert/compaction lifecycle;
  - snapshot census: live files, live bytes, live rows (from add stats),
    tombstone count, table version, schema-change count.

The encoder companion builds a log from a scripted action history so the
replay is exercised end-to-end (the q329 walker discipline); malformed
framing raises ValueError naming the problem. No reference parity (the
reference has no table-versioning surface) — §7 extension.
"""

from __future__ import annotations

import json

__all__ = [
    "encode_delta_log",
    "replay_delta_log",
    "delta_snapshot_census",
    "encode_delta_checkpoint",
    "replay_delta_checkpoint",
    "prune_live_files",
]


def encode_delta_log(history: list) -> dict:
    """Build a transaction log from a scripted history: ``history`` is a
    list of versions, each a list of action dicts like
    {"op": "add", "path": ..., "size": int, "rows": int} /
    {"op": "remove", "path": ...} / {"op": "metaData", "schema": str}.
    Returns {version: file_text} — the `_delta_log` directory as a dict
    (filename would be f"{version:020d}.json")."""
    out = {}
    for version, actions in enumerate(history):
        lines = []
        if version == 0:
            lines.append(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}))
        for a in actions:
            op = a.get("op")
            if op == "add":
                stats = {"numRecords": int(a.get("rows", 0))}
                # per-column min/max stats (PROTOCOL.md Per-file Statistics)
                # — the planner-side file-skipping input
                if a.get("min") is not None:
                    stats["minValues"] = dict(a["min"])
                if a.get("max") is not None:
                    stats["maxValues"] = dict(a["max"])
                lines.append(
                    json.dumps(
                        {
                            "add": {
                                "path": a["path"],
                                "size": int(a.get("size", 0)),
                                "partitionValues": a.get("partitionValues", {}),
                                "dataChange": True,
                                "stats": json.dumps(stats),
                            }
                        }
                    )
                )
            elif op == "remove":
                lines.append(
                    json.dumps(
                        {
                            "remove": {
                                "path": a["path"],
                                "deletionTimestamp": int(a.get("ts", 0)),
                                "dataChange": True,
                            }
                        }
                    )
                )
            elif op == "metaData":
                lines.append(
                    json.dumps(
                        {
                            "metaData": {
                                "id": a.get("id", "00000000-0000-0000-0000-000000000000"),
                                "schemaString": a.get("schema", "{}"),
                                "partitionColumns": a.get("partitionColumns", []),
                            }
                        }
                    )
                )
            else:
                raise ValueError(f"unknown delta action op {op!r}")
        out[version] = "\n".join(lines) + "\n"
    return out


def _apply_version_text(live: dict, tombstones: set, text: str, v: int) -> tuple:
    """Apply one version file's action lines to (live, tombstones) in
    place; returns (n_adds, n_removes, schema_changes, protocol_or_None,
    metadata_or_None) for this version. Shared by the full-JSON replay
    and the checkpoint-tail replay so both paths enforce identical
    grammar."""
    schema_changes = 0
    protocol = None
    metadata = None
    n_adds = n_removes = 0
    for ln, line in enumerate(text.splitlines()):
        if not line.strip():
            continue
        try:
            action = json.loads(line)
        except ValueError:
            raise ValueError(
                f"malformed delta log: version {v} line {ln} is not JSON"
            ) from None
        if "protocol" in action:
            protocol = action["protocol"]
        elif "metaData" in action:
            schema_changes += 1
            m = action["metaData"]
            metadata = {
                "id": m.get("id", ""),
                "schemaString": m.get("schemaString", m.get("schema", "{}")),
                "partitionColumns": list(m.get("partitionColumns", [])),
            }
        elif "add" in action:
            a = action["add"]
            if "path" not in a:
                raise ValueError(f"malformed delta add at version {v}: no path")
            stats = a.get("stats")
            rows = None
            mins = maxs = None
            if stats:
                try:
                    parsed = json.loads(stats)
                except ValueError:
                    raise ValueError(
                        f"malformed delta add stats at version {v}"
                    ) from None
                rows = parsed.get("numRecords")
                mins = parsed.get("minValues")
                maxs = parsed.get("maxValues")
            entry = {"size": a.get("size", 0), "rows": rows or 0}
            if mins is not None:
                entry["min"] = mins
            if maxs is not None:
                entry["max"] = maxs
            live[a["path"]] = entry
            tombstones.discard(a["path"])
            n_adds += 1
        elif "remove" in action:
            r = action["remove"]
            if "path" not in r:
                raise ValueError(f"malformed delta remove at version {v}: no path")
            live.pop(r["path"], None)
            tombstones.add(r["path"])
            n_removes += 1
        else:
            raise ValueError(
                f"malformed delta log: unknown action keys {sorted(action)} "
                f"at version {v}"
            )
    return n_adds, n_removes, schema_changes, protocol, metadata


def replay_delta_log(log: dict, at_version: int | None = None) -> dict:
    """Replay {version: file_text} up to ``at_version`` (inclusive;
    default: all) and return the snapshot: live files
    {path: {size, rows}}, tombstones, schema-change count, protocol.
    Versions must be contiguous from 0 — a gap means a lost commit and
    raises (the corruption a real reader must refuse to read past)."""
    if not log:
        raise ValueError("empty delta log: no version files")
    versions = sorted(log)
    if versions[0] != 0 or versions != list(range(len(versions))):
        raise ValueError("delta log version gap: commits must be contiguous from 0")
    if at_version is not None:
        versions = [v for v in versions if v <= at_version]
        if not versions:
            raise ValueError(f"no log versions at or below {at_version}")
    live: dict = {}
    tombstones: set = set()
    schema_changes = 0
    protocol = None
    metadata = None
    n_adds = n_removes = 0
    for v in versions:
        a, r, sc, proto, meta = _apply_version_text(live, tombstones, log[v], v)
        n_adds += a
        n_removes += r
        schema_changes += sc
        if proto is not None:
            protocol = proto
        if meta is not None:
            metadata = meta
    return {
        "version": versions[-1],
        "protocol": protocol,
        "metaData": metadata,
        "live_files": live,
        "n_live_files": len(live),
        "live_bytes": sum(f["size"] for f in live.values()),
        "live_rows": sum(f["rows"] for f in live.values()),
        "n_tombstones": len(tombstones),
        "tombstones": sorted(tombstones),
        "n_adds": n_adds,
        "n_removes": n_removes,
        "schema_changes": schema_changes,
    }


def encode_delta_checkpoint(snapshot: dict) -> bytes:
    """Compact a snapshot into a checkpoint PARQUET file with the real
    Delta checkpoint shape (delta.io PROTOCOL.md "Checkpoints"): one row
    per action, STRUCT columns ``protocol`` / ``metaData`` / ``add`` /
    ``remove``, all null except the row's own action — live adds carry
    stats JSON, remove rows are the unexpired tombstones, and exactly ONE
    metaData row carries the table id / schema string / partition columns
    (PROTOCOL.md requires one per checkpoint; a snapshot that never saw a
    metaData action gets a minimal placeholder so the requirement still
    holds). Written with pyarrow (v1 data pages) — an INDEPENDENT writer,
    so replay_delta_checkpoint's stdlib read of it is
    cross-implementation evidence, not a self-loop."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    adds: list = []
    removes: list = []
    protocols: list = []
    metadatas: list = []

    def _row(protocol=None, metadata=None, add=None, remove=None):
        protocols.append(protocol)
        metadatas.append(metadata)
        adds.append(add)
        removes.append(remove)

    proto = snapshot.get("protocol") or {"minReaderVersion": 1, "minWriterVersion": 2}
    _row(
        protocol={
            "minReaderVersion": int(proto.get("minReaderVersion", 1)),
            "minWriterVersion": int(proto.get("minWriterVersion", 2)),
        }
    )
    meta = snapshot.get("metaData") or {
        "id": "00000000-0000-0000-0000-000000000000",
        "schemaString": "{}",
        "partitionColumns": [],
    }
    _row(
        metadata={
            "id": str(meta.get("id", "")),
            "schemaString": str(meta.get("schemaString", "{}")),
            "partitionColumns": json.dumps(
                list(meta.get("partitionColumns", []))
            ),
        }
    )
    for path in sorted(snapshot["live_files"]):
        f = snapshot["live_files"][path]
        stats = {"numRecords": int(f["rows"])}
        if "min" in f:
            stats["minValues"] = f["min"]
        if "max" in f:
            stats["maxValues"] = f["max"]
        _row(
            add={
                "path": path,
                "size": int(f["size"]),
                "stats": json.dumps(stats),
            }
        )
    for path in snapshot.get("tombstones", []):
        _row(remove={"path": path, "deletionTimestamp": 0})
    table = pa.table(
        {
            "protocol": pa.array(
                protocols,
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            # partitionColumns travels as a JSON string, not a LIST column:
            # the stdlib reader's struct decode is depth-1 (struct of
            # primitives); a list-inside-struct would be the depth-2 shape
            # it refuses. JSON keeps the payload lossless within that.
            "metaData": pa.array(
                metadatas,
                pa.struct(
                    [("id", pa.string()), ("schemaString", pa.string()),
                     ("partitionColumns", pa.string())]
                ),
            ),
            "add": pa.array(
                adds,
                pa.struct(
                    [("path", pa.string()), ("size", pa.int64()), ("stats", pa.string())]
                ),
            ),
            "remove": pa.array(
                removes,
                pa.struct([("path", pa.string()), ("deletionTimestamp", pa.int64())]),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf, data_page_version="1.0")
    return buf.getvalue()


def replay_delta_checkpoint(
    checkpoint: bytes, cp_version: int, tail: dict, at_version: int | None = None
) -> dict:
    """Reconstruct a snapshot from a parquet CHECKPOINT plus the JSON
    commit tail — how a real reader consumes a long log (PROTOCOL.md:
    `_last_checkpoint` names the version; only commits after it are
    walked). The checkpoint's struct columns decode through
    operators/parquet_meta.read_column (definition-level struct members:
    null in rows belonging to other action types), proving the parquet
    rung and the log rung COMPOSE. Tail versions must be contiguous from
    cp_version + 1 — a gap raises, exactly like the full replay."""
    from .parquet_meta import read_table

    t = read_table(checkpoint)
    live: dict = {}
    tombstones: set = set()
    protocol = None
    metadata = None
    n_rows = len(t.get("add.path", []))
    for i in range(n_rows):
        if t["add.path"][i] is not None:
            stats = t["add.stats"][i]
            entry = {"size": t["add.size"][i], "rows": 0}
            if stats is not None:
                parsed = json.loads(bytes(stats).decode())
                entry["rows"] = parsed.get("numRecords", 0)
                if parsed.get("minValues") is not None:
                    entry["min"] = parsed["minValues"]
                if parsed.get("maxValues") is not None:
                    entry["max"] = parsed["maxValues"]
            live[bytes(t["add.path"][i]).decode()] = entry
        elif t["remove.path"][i] is not None:
            tombstones.add(bytes(t["remove.path"][i]).decode())
        elif t["protocol.minReaderVersion"][i] is not None:
            protocol = {
                "minReaderVersion": t["protocol.minReaderVersion"][i],
                "minWriterVersion": t["protocol.minWriterVersion"][i],
            }
        elif t.get("metaData.id") is not None and t["metaData.id"][i] is not None:
            metadata = {
                "id": bytes(t["metaData.id"][i]).decode(),
                "schemaString": bytes(t["metaData.schemaString"][i]).decode(),
                "partitionColumns": json.loads(
                    bytes(t["metaData.partitionColumns"][i]).decode()
                ),
            }
    versions = sorted(tail)
    if at_version is not None:
        versions = [v for v in versions if v <= at_version]
    if versions != list(range(cp_version + 1, cp_version + 1 + len(versions))):
        raise ValueError(
            f"delta log version gap: tail after checkpoint {cp_version} "
            f"must be contiguous, got {versions}"
        )
    schema_changes = 0
    n_adds = n_removes = 0
    for v in versions:
        a, r, sc, proto, meta = _apply_version_text(live, tombstones, tail[v], v)
        n_adds += a
        n_removes += r
        schema_changes += sc
        if proto is not None:
            protocol = proto
        if meta is not None:
            metadata = meta
    return {
        "version": versions[-1] if versions else cp_version,
        "protocol": protocol,
        "metaData": metadata,
        "live_files": live,
        "n_live_files": len(live),
        "live_bytes": sum(f["size"] for f in live.values()),
        "live_rows": sum(f["rows"] for f in live.values()),
        "n_tombstones": len(tombstones),
        "tombstones": sorted(tombstones),
        "n_adds_after_checkpoint": n_adds,
        "n_removes_after_checkpoint": n_removes,
    }


def prune_live_files(
    snapshot: dict, column: str, lo=None, hi=None
) -> dict:
    """Stats-based FILE SKIPPING over a snapshot's live files — the
    100 TB read path's step one: decide which of a million files a range
    predicate ``lo <= column <= hi`` can possibly touch WITHOUT opening
    any of them, from the add-action min/max statistics alone
    (delta.io PROTOCOL.md Per-file Statistics; the same data-skipping
    contract Delta/Iceberg planners implement). Semantics are
    conservative by construction — pruning must NEVER drop a file that
    could hold a matching row:

      - skip iff the file's recorded range cannot intersect [lo, hi]
        (max < lo or min > hi); one-sided predicates pass None for the
        open bound;
      - a file with NO stats for the column is always KEPT (stats are an
        optimization, never a license to skip blind);
      - returns {"kept": sorted paths, "skipped": sorted paths,
        "n_live": N} so callers can audit effectiveness.

    The caller then scans only ``kept`` — correctness is auditable by
    scanning everything and comparing (q348 does exactly that)."""
    kept: list = []
    skipped: list = []
    for path in sorted(snapshot["live_files"]):
        f = snapshot["live_files"][path]
        fmin = (f.get("min") or {}).get(column)
        fmax = (f.get("max") or {}).get(column)
        if fmin is None or fmax is None:
            kept.append(path)  # no stats -> must scan
            continue
        if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
            skipped.append(path)
        else:
            kept.append(path)
    return {
        "kept": kept,
        "skipped": skipped,
        "n_live": len(snapshot["live_files"]),
    }


DELTA_CENSUS_SCHEMA = (
    "doc_id bigint, version int, n_live_files int, live_bytes bigint, "
    "live_rows bigint, n_tombstones int, n_adds int, n_removes int, "
    "schema_changes int"
)


def delta_snapshot_census_gen(log_col: str = "log_json", id_col: str = "doc_id"):
    """The ``delta_snapshot_census`` walk as a pandas-iterator function,
    for fusing with an upstream generator inside ONE mapInPandas stage."""
    import pandas as pd

    def walk(batches):
        for pdf in batches:
            rows = []
            for did, raw in zip(pdf[id_col], pdf[log_col]):
                log = {int(k): v for k, v in json.loads(raw).items()}
                snap = replay_delta_log(log)
                rows.append(
                    {
                        id_col: int(did),
                        "version": snap["version"],
                        "n_live_files": snap["n_live_files"],
                        "live_bytes": snap["live_bytes"],
                        "live_rows": snap["live_rows"],
                        "n_tombstones": snap["n_tombstones"],
                        "n_adds": snap["n_adds"],
                        "n_removes": snap["n_removes"],
                        "schema_changes": snap["schema_changes"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "version", "n_live_files", "live_bytes",
                    "live_rows", "n_tombstones", "n_adds", "n_removes",
                    "schema_changes",
                ],
            )

    return walk


def delta_snapshot_census(df, log_col: str = "log_json", id_col: str = "doc_id"):
    """(id, serialized log) -> snapshot census per table in one Arrow map
    pass. The log arrives as a JSON object {version: file_text} in a
    string column (the shape a catalog crawl produces); only census rows
    come out."""
    schema = (
        f"{id_col} bigint, version int, n_live_files int, live_bytes bigint, "
        "live_rows bigint, n_tombstones int, n_adds int, n_removes int, "
        "schema_changes int"
    )
    return df.mapInPandas(delta_snapshot_census_gen(log_col, id_col), schema)
