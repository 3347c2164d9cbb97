"""Optional table-format (Delta) Warehouse surface. The container has
no delta-spark package, so the real round-trip test self-skips; the
gating behavior (clear ImportError, parquet default untouched) is
always tested."""

import pytest

from nyc_etl_pipeline_spark.io import Warehouse, delta_available, read_testdata


def test_warehouse_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported table format"):
        Warehouse(spark, str(tmp_path), table_format="avro")


def test_delta_gate_raises_clearly_without_package(spark, tmp_path):
    if delta_available():
        pytest.skip("delta-spark present; gate not reachable")
    with pytest.raises(ImportError, match="delta-spark"):
        Warehouse(spark, str(tmp_path), table_format="delta")


def test_parquet_default_unchanged(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.table_format == "parquet"
    nation = read_testdata(spark, sf_dir, "nation")
    wh.overwrite(nation, "nation")
    assert wh.read("nation").count() == nation.count()


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_roundtrip_and_compaction(spark, sf_dir, tmp_path):
    """Runs only where delta-spark is installed (not this container):
    ACID overwrite/append/read/OPTIMIZE-compaction round-trip."""
    wh = Warehouse(spark, str(tmp_path / "dwh"), table_format="delta")
    nation = read_testdata(spark, sf_dir, "nation")
    wh.overwrite(nation, "nation")
    wh.append(nation.limit(5), "nation")
    assert wh.read("nation").count() == nation.count() + 5
    assert wh.compact("nation") >= 1
