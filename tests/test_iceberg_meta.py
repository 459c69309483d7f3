"""Pure-Python Iceberg metadata reads (plans/iceberg_meta.py) + the
stdlib Avro codec underneath it (plans/avro.py).

The Avro wire format is pinned against HAND-ASSEMBLED buffers (not just
self-roundtrip): varint/zigzag bytes straight from the Avro spec's
encoding table, a record decoded from a byte string composed by hand,
and a complete object-container file built byte-by-byte in the test —
a mutually-consistent encode/decode deviation would fail these."""

import io
import json
import os
import struct
import zlib

import pytest

from geokitten_spark.plans.avro import (
    decode_value,
    encode_value,
    read_avro_file,
    write_avro_file,
)
from geokitten_spark.plans.iceberg_meta import (
    read_iceberg_table,
    write_fixture_iceberg_table,
)

from tests.conftest import SF_SMOKE


def _enc(schema, value) -> bytes:
    buf = io.BytesIO()
    encode_value(buf, schema, value)
    return buf.getvalue()


def test_avro_long_zigzag_spec_vectors():
    # the exact table from the Avro spec's binary-encoding section
    for n, want in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
        (8192, b"\x80\x80\x01"), (-8193, b"\x81\x80\x01"),
    ]:
        assert _enc("long", n) == want, n
        assert decode_value(io.BytesIO(want), "long") == n


def test_avro_primitives_and_union_bytes():
    assert _enc("string", "foo") == b"\x06foo"  # len 3 zigzag = 6
    assert _enc("boolean", True) == b"\x01"
    assert _enc("double", 1.0) == struct.pack("<d", 1.0)
    # union ["null","long"]: null -> index 0 only; 7 -> index 1 + value
    u = ["null", "long"]
    assert _enc(u, None) == b"\x00"
    assert _enc(u, 7) == b"\x02\x0e"
    assert decode_value(io.BytesIO(b"\x02\x0e"), u) == 7


def test_avro_record_decodes_hand_assembled_bytes():
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "path", "type": "string"},
            {"name": "rows", "type": "long"},
            {"name": "ok", "type": "boolean"},
        ],
    }
    raw = b"\x04ab" + b"\x96\x01" + b"\x01"  # "ab", 75, true — by hand
    assert decode_value(io.BytesIO(raw), schema) == {
        "path": "ab", "rows": 75, "ok": True,
    }
    assert _enc(schema, {"path": "ab", "rows": 75, "ok": True}) == raw


def test_avro_container_reads_hand_built_file(tmp_path):
    """Assemble a full object-container file byte-by-byte (null codec)
    and read it back — proves the reader against the spec itself."""
    schema = {"type": "record", "name": "x",
              "fields": [{"name": "v", "type": "long"}]}
    schema_b = json.dumps(schema).encode()

    def vint(n):  # zigzag varint by hand
        z = (n << 1) ^ (n >> 63)
        out = b""
        while True:
            b, z = z & 0x7F, z >> 7
            if z:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    sync = bytes(range(16))
    buf = b"Obj\x01"
    # file-metadata map: 1 block, 2 entries
    buf += vint(2)
    buf += vint(len(b"avro.schema")) + b"avro.schema"
    buf += vint(len(schema_b)) + schema_b
    buf += vint(len(b"avro.codec")) + b"avro.codec"
    buf += vint(4) + b"null"
    buf += vint(0)  # map terminator
    buf += sync
    payload = vint(5) + vint(-3)  # two records: v=5, v=-3
    buf += vint(2) + vint(len(payload)) + payload + sync
    p = tmp_path / "hand.avro"
    p.write_bytes(buf)
    got_schema, meta, records = read_avro_file(str(p))
    assert got_schema == schema
    assert records == [{"v": 5}, {"v": -3}]


def test_avro_enum_fixed_and_skippable_blocks():
    enum = {"type": "enum", "name": "status", "symbols": ["ok", "bad"]}
    assert _enc(enum, "bad") == b"\x02"  # index 1 zigzag
    assert decode_value(io.BytesIO(b"\x02"), enum) == "bad"
    fixed = {"type": "fixed", "name": "sync", "size": 4}
    assert _enc(fixed, b"abcd") == b"abcd"
    assert decode_value(io.BytesIO(b"abcd"), fixed) == b"abcd"
    with pytest.raises(ValueError, match="4 bytes"):
        _enc(fixed, b"ab")
    # negative array block count: abs(count) items preceded by byte size
    arr = {"type": "array", "items": "long"}
    raw = b"\x03" + b"\x04" + b"\x02\x04" + b"\x00"  # count -2, size 2, [1,2]
    assert decode_value(io.BytesIO(raw), arr) == [1, 2]


def test_avro_file_roundtrip_deflate(tmp_path):
    schema = {
        "type": "record", "name": "e",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": ["null", "long"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
        ],
    }
    records = [
        {"s": "a", "n": None, "tags": [], "props": {}},
        {"s": "b", "n": 42, "tags": ["x", "y"], "props": {"k": -7}},
    ]
    p = str(tmp_path / "t.avro")
    write_avro_file(p, schema, records, codec="deflate")
    got_schema, meta, got = read_avro_file(p)
    assert got == records and got_schema == schema
    assert meta["avro.codec"] == b"deflate"
    # the payload really is raw-deflate (re-inflate the block by hand)
    data = open(p, "rb").read()
    assert data[:4] == b"Obj\x01"
    # determinism: same inputs -> byte-identical file
    p2 = str(tmp_path / "t2.avro")
    write_avro_file(p2, schema, records, codec="deflate")
    assert open(p2, "rb").read() == data


def test_iceberg_fixture_table_lineage_and_read(spark, tmp_path):
    """End-to-end S8 read path: real parquet data files + spec-shaped
    metadata tree -> read_iceberg_table returns the .files-contract
    lineage (file_path/record_count/file_size_in_bytes triple) matching
    the parquet footers EXACTLY, and to_df() reads the right rows —
    including time travel to the older snapshot."""
    from geokitten_spark.plans.snapshot import SnapshotStore

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang"
    )
    loc = str(tmp_path / "tbl")
    d1 = os.path.join(loc, "data", "s1")
    d2 = os.path.join(loc, "data", "s2")
    docs.filter("doc_id % 2 = 0").repartition(3).write.parquet(d1)
    docs.repartition(4).write.parquet(d2)

    def footers(d):
        return [
            {"file": os.path.join(d, m["file"]), "rows": m["rows"],
             "bytes": m["bytes"]}
            for m in SnapshotStore._parquet_file_metrics(d)
        ]
    f1, f2 = footers(d1), footers(d2)
    write_fixture_iceberg_table(loc, [(100, f1), (200, f2)])

    tbl = read_iceberg_table(loc)
    assert tbl.current_snapshot_id == 200
    assert sorted(tbl.snapshots) == [100, 200]
    # lineage == parquet footers, exactly (the .files contract triple)
    assert tbl.files == sorted(f2, key=lambda f: f["file"])
    assert tbl.snapshots[100].files == sorted(f1, key=lambda f: f["file"])
    assert sum(f["rows"] for f in tbl.files) == docs.count()
    # distributed read of current + time travel to the older snapshot
    assert tbl.to_df(spark).count() == docs.count()
    old = tbl.to_df(spark, snapshot_id=100)
    assert old.count() == docs.filter("doc_id % 2 = 0").count()
    assert old.filter("doc_id % 2 = 1").count() == 0


def test_iceberg_reader_rejects_torn_manifest(tmp_path, spark):
    """A manifest whose on-disk size disagrees with the recorded
    manifest_length (torn metadata) must fail loudly, not return
    partial lineage."""
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    loc = str(tmp_path / "tbl")
    d1 = os.path.join(loc, "data")
    docs.write.parquet(d1)
    from geokitten_spark.plans.snapshot import SnapshotStore

    files = [
        {"file": os.path.join(d1, m["file"]), "rows": m["rows"],
         "bytes": m["bytes"]}
        for m in SnapshotStore._parquet_file_metrics(d1)
    ]
    write_fixture_iceberg_table(loc, [(1, files)])
    mpath = os.path.join(loc, "metadata", "manifest-1-m0.avro")
    with open(mpath, "ab") as f:
        f.write(b"\x00")  # grow the file past the recorded length
    with pytest.raises(ValueError, match="torn metadata"):
        read_iceberg_table(loc)


def test_snapshot_store_stage_is_iceberg_readable(spark, tmp_path):
    """Every committed parquet-backend stage snapshot doubles as an
    Iceberg table: read_iceberg_table(snap_dir) returns the SAME
    per-file lineage the stage manifest recorded, and a time-travel scan
    reproduces the stage rows."""
    from geokitten_spark.plans.snapshot import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"))
    res = store.run_stage(
        spark,
        "stg",
        lambda s: s.range(1000).withColumnRenamed("id", "doc_id")
        .repartition(4, "doc_id"),
        config={"v": 1},
    )
    snap_dir = os.path.join(store.root, "stg", f"snap-{res.snapshot_id}")
    tbl = read_iceberg_table(snap_dir)
    want = sorted(
        (os.path.join(snap_dir, "data", p["file"]), p["rows"], p["bytes"])
        for p in res.manifest["partitions"]
    )
    got = [(f["file"], f["rows"], f["bytes"]) for f in tbl.files]
    assert got == want
    assert tbl.to_df(spark).count() == 1000
    # resumed stages must NOT rewrite metadata (same tree still reads)
    res2 = store.run_stage(
        spark,
        "stg",
        lambda s: s.range(1000).withColumnRenamed("id", "doc_id"),
        config={"v": 1},
    )
    assert res2.resumed
    assert read_iceberg_table(snap_dir).files == tbl.files


def test_iceberg_files_contract_relation_parity(spark, tmp_path):
    """The reader's lineage satisfies SnapshotStore's .files-contract
    extractor when presented as a relation — the two S8 halves agree."""
    from geokitten_spark.plans.snapshot import SnapshotStore

    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    loc = str(tmp_path / "tbl")
    d1 = os.path.join(loc, "data")
    docs.repartition(2).write.parquet(d1)
    files = [
        {"file": os.path.join(d1, m["file"]), "rows": m["rows"],
         "bytes": m["bytes"]}
        for m in SnapshotStore._parquet_file_metrics(d1)
    ]
    write_fixture_iceberg_table(loc, [(7, files)])
    tbl = read_iceberg_table(loc)
    rel = spark.createDataFrame(
        [(f["file"], f["rows"], f["bytes"]) for f in tbl.files],
        "file_path string, record_count long, file_size_in_bytes long",
    )
    metrics = SnapshotStore._files_relation_metrics(rel)
    assert metrics == tbl.files