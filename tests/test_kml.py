"""KML conversion surface tests (SURVEY §2.1 S2-S5, §2.3 F8/F9):
distributed scan/consolidate semantics + byte parity against the
reference's golden output files."""

import glob
import os

import pytest

from geokitten_spark.fixtures import kml_corpus
from geokitten_spark.sources.kml import (
    parse_kml_bytes,
    read_kml_dir,
    consolidate_kml_dir,
    render_kml,
    kml_strings,
    write_kml_dir,
    kml_to_kml_proper,
)

REF_IN = "/root/reference/tests/tests_files/inputs/gdf_kml_converter/KMLsToKMLsProperFormat"
REF_GOLD = "/root/reference/tests/tests_files/outputs/gdf_kml_converter/KMLsToKMLsProperFormat"


@pytest.fixture(scope="module")
def kml_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kmls")
    for _, row in kml_corpus().iterrows():
        (d / row["file_name"]).write_bytes(row["kml_bytes"])
    (d / "broken.kml").write_bytes(b"<kml><unclosed>")
    return str(d)


def test_parse_kml_bytes_roundtrip():
    row = kml_corpus().iloc[0]
    out = parse_kml_bytes(row["kml_bytes"])
    assert len(out) == 1
    name, wkt = out[0]
    assert name == "05001010100"
    assert wkt.startswith("POLYGON")


def test_parse_kml_bad_bytes():
    assert parse_kml_bytes(b"<kml><unclosed>") == []
    assert parse_kml_bytes(b"not xml at all") == []


def test_read_kml_dir_skips_bad_files(spark, kml_dir):
    df = read_kml_dir(spark, kml_dir)
    rows = df.collect()
    assert len(rows) == 6  # broken.kml contributed nothing
    assert {r.file_name for r in rows} == {f"{5001010100 + i:011d}.kml" for i in range(6)}


def test_consolidate_semantics(spark, kml_dir):
    df = consolidate_kml_dir(spark, kml_dir, id_column_name="Name")
    assert df.columns == ["Name", "geometry_wkt"]  # exact 2-col projection
    rows = df.collect()
    assert sorted(r.Name for r in rows) == [f"{5001010100 + i:011d}" for i in range(6)]
    assert all(r.geometry_wkt.startswith("POLYGON") for r in rows)


def test_render_stub_for_non_polygon():
    kml = render_kml("d", [("p1", "POINT (1 2)")])
    assert "<Placemark>" in kml and "<Polygon>" not in kml


def test_kml_sink_roundtrip(spark, kml_dir, tmp_path):
    scan = consolidate_kml_dir(spark, kml_dir)
    out = str(tmp_path / "out")
    n = write_kml_dir(kml_strings(scan, id_col="Name"), out)
    assert n == 6
    written = sorted(os.listdir(out))
    assert len(written) == 6
    # re-read what we wrote: same names + polygonal geometry survives
    df2 = read_kml_dir(spark, out)
    assert df2.count() == 6


@pytest.mark.skipif(not os.path.isdir(REF_IN), reason="reference not present")
def test_s5_byte_parity_with_reference_goldens(spark, tmp_path):
    """kml_to_kml_proper output must be byte-identical to the reference's
    golden files (gdf_kml_converter_test_suite.py:393-411 corpus)."""
    out = str(tmp_path / "proper")
    n = kml_to_kml_proper(spark, REF_IN, out)
    golds = sorted(glob.glob(REF_GOLD + "/*.kml"))
    assert n == len(golds) > 0
    for g in golds:
        mine = os.path.join(out, os.path.basename(g))
        assert open(mine, "rb").read() == open(g, "rb").read(), os.path.basename(g)
