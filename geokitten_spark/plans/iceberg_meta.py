"""Pure-Python Iceberg table-metadata reader (S8 read path, jar-free).

The Iceberg runtime jar is absent in this sandbox, so until now the S8
read path was contract-shaped only (``ICEBERG_FILES_CONTRACT`` asserted
against a spec-shaped local relation). This module makes snapshot /
lineage READS real: it walks the published Iceberg table-format spec
(https://iceberg.apache.org/spec/) —

    <table>/metadata/version-hint.text        -> current metadata version
    <table>/metadata/v<N>.metadata.json       -> snapshots, current id,
                                                 manifest-list location
    <table>/metadata/snap-*.avro              -> manifest list (Avro)
    <table>/metadata/*-m*.avro                -> manifests (Avro), one
                                                 entry per data file

— using the stdlib-only Avro container codec in ``plans/avro.py``. The
returned lineage carries exactly what the ``.files`` metadata relation
promises (``file_path``, ``record_count``, ``file_size_in_bytes`` —
the ``ICEBERG_FILES_CONTRACT`` columns), so
``SnapshotStore._files_relation_metrics`` semantics hold without a JVM
catalog. Only the WRITE path remains jar-gated.

Scale note: table metadata is control-plane — a 10^12-row table's
manifest list is KBs and its manifests MBs; reading them driver-side is
exactly what the Iceberg client library itself does. The data files are
NEVER touched here: ``to_df`` hands the pruned file list to
``spark.read.parquet``, which plans a normal distributed scan.

Fixture writing: ``write_fixture_iceberg_table`` lays down the same
layout for tests (the sandbox has no independent Avro producer, so
container-level byte encodings are pinned against hand-assembled
buffers in tests/test_iceberg_meta.py — same discipline as the MVT
protobuf codec).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass

from .avro import read_avro_file, write_avro_file

__all__ = [
    "IcebergSnapshot",
    "IcebergTable",
    "read_iceberg_table",
    "write_fixture_iceberg_table",
]


# Iceberg spec manifest-list schema (the subset of required fields the
# lineage reader uses; field ids per the spec's manifest-list table)
MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
    ],
}

# Manifest-file schema: entry status + nested data_file record (again the
# required subset: file_path / file_format / record_count /
# file_size_in_bytes are all spec-required fields)
MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                ],
            },
        },
    ],
}

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2


@dataclass
class IcebergSnapshot:
    snapshot_id: int
    manifest_list: str
    files: list  # [{"file", "rows", "bytes"}] — the .files contract


@dataclass
class IcebergTable:
    location: str
    current_snapshot_id: int
    snapshots: dict  # snapshot_id -> IcebergSnapshot
    metadata: dict  # the raw vN.metadata.json

    @property
    def current(self) -> IcebergSnapshot:
        return self.snapshots[self.current_snapshot_id]

    @property
    def files(self) -> list:
        """Lineage of the CURRENT snapshot: [{"file", "rows", "bytes"}] —
        the same triple the ``.files`` metadata relation exposes as
        (file_path, record_count, file_size_in_bytes)."""
        return self.current.files

    def to_df(self, spark, snapshot_id: int | None = None):
        """Distributed read of a snapshot's data: the driver hands the
        manifest-pruned file list to ``spark.read.parquet`` (time travel
        = pass an older snapshot_id)."""
        snap = self.snapshots[
            self.current_snapshot_id if snapshot_id is None else snapshot_id
        ]
        if not snap.files:
            raise ValueError(f"snapshot {snap.snapshot_id} has no data files")
        return spark.read.parquet(*[f["file"] for f in snap.files])


def _resolve(table_location: str, path: str) -> str:
    """Manifest paths in metadata are absolute URIs per the spec; accept
    relative ones in fixtures."""
    if path.startswith("file:"):
        return path[len("file:"):]
    if os.path.isabs(path):
        return path
    return os.path.join(table_location, path)


def read_iceberg_table(location: str) -> IcebergTable:
    """Read an Iceberg table's metadata tree (no JVM, no data pass)."""
    meta_dir = os.path.join(location, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        version = int(open(hint).read().strip())
        meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    else:  # fall back: highest vN.metadata.json present
        versions = [
            int(m.group(1))
            for fn in os.listdir(meta_dir)
            if (m := re.fullmatch(r"v(\d+)\.metadata\.json", fn))
        ]
        if not versions:
            raise FileNotFoundError(f"no metadata json under {meta_dir}")
        meta_path = os.path.join(meta_dir, f"v{max(versions)}.metadata.json")
    metadata = json.load(open(meta_path))

    snapshots = {}
    for snap in metadata.get("snapshots", []):
        sid = int(snap["snapshot-id"])
        mlist_path = _resolve(location, snap["manifest-list"])
        _schema, _meta, manifests = read_avro_file(mlist_path)
        files = []
        for mf in manifests:
            mpath = _resolve(location, mf["manifest_path"])
            actual = os.path.getsize(mpath)
            if int(mf["manifest_length"]) != actual:
                raise ValueError(
                    f"manifest {mpath}: length {actual} != recorded "
                    f"{mf['manifest_length']} (torn metadata?)"
                )
            _s, _m, entries = read_avro_file(mpath)
            for e in entries:
                if e["status"] == _STATUS_DELETED:
                    continue
                d = e["data_file"]
                files.append(
                    {
                        "file": _resolve(location, d["file_path"]),
                        "rows": int(d["record_count"]),
                        "bytes": int(d["file_size_in_bytes"]),
                    }
                )
        files.sort(key=lambda f: f["file"])
        snapshots[sid] = IcebergSnapshot(sid, mlist_path, files)

    cur = int(metadata["current-snapshot-id"])
    if cur not in snapshots:
        raise ValueError(
            f"current-snapshot-id {cur} not among snapshots "
            f"{sorted(snapshots)}"
        )
    return IcebergTable(location, cur, snapshots, metadata)


def write_fixture_iceberg_table(
    location: str,
    snapshots: list[tuple[int, list[dict]]],
    *,
    table_uuid: str = "00000000-0000-0000-0000-000000000001",
) -> str:
    """Lay down a spec-shaped metadata tree over EXISTING parquet files.

    ``snapshots`` is [(snapshot_id, [{"file", "rows", "bytes"}, ...])] in
    commit order; the last entry becomes the current snapshot. Returns
    the metadata json path. Data files are untouched — only
    metadata/*.json + *.avro are written (what a real Iceberg commit
    writes besides the data)."""
    meta_dir = os.path.join(location, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snaps_json = []
    for sid, files in snapshots:
        manifest_path = os.path.join(meta_dir, f"manifest-{sid}-m0.avro")
        entries = [
            {
                "status": _STATUS_ADDED,
                "snapshot_id": sid,
                "data_file": {
                    "file_path": f["file"],
                    "file_format": "PARQUET",
                    "record_count": int(f["rows"]),
                    "file_size_in_bytes": int(f["bytes"]),
                },
            }
            for f in files
        ]
        write_avro_file(manifest_path, MANIFEST_ENTRY_SCHEMA, entries)
        mlist_path = os.path.join(meta_dir, f"snap-{sid}-1.avro")
        write_avro_file(
            mlist_path,
            MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": manifest_path,
                    "manifest_length": os.path.getsize(manifest_path),
                    "partition_spec_id": 0,
                    "added_snapshot_id": sid,
                }
            ],
        )
        snaps_json.append(
            {
                "snapshot-id": sid,
                "timestamp-ms": 0,
                "manifest-list": mlist_path,
                "summary": {"operation": "append"},
            }
        )
    metadata = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": location,
        "current-snapshot-id": snapshots[-1][0],
        "snapshots": snaps_json,
        "schemas": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
    }
    version = len(snapshots)
    meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(meta_path, "w") as f:
        json.dump(metadata, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
    return meta_path
