"""Source/sink format coverage beyond parquet (SURVEY §2.1 family):
CSV, JSON, ORC round-trips with explicit schemas (never inference in
the engine path)."""

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_csv, read_testdata
from nyc_etl_pipeline_spark.schemas import TESTDATA


def _canon(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = read_testdata(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nation.write.option("header", True).csv(path)
    back = read_csv(spark, path, TESTDATA["nation"])
    assert _canon(back, nation.columns) == _canon(nation, nation.columns)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    orders = read_testdata(spark, sf_dir, "orders").limit(500)
    path = str(tmp_path / "orders_json")
    orders.write.json(path)
    back = spark.read.schema(TESTDATA["orders"]).json(path)
    assert _canon(back, orders.columns) == _canon(orders, orders.columns)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from nyc_etl_pipeline_spark import plans as P

    li = read_testdata(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_orc")
    li.write.orc(path)
    back = spark.read.schema(TESTDATA["lineitem"]).orc(path)
    assert back.count() == li.count()
    filtered = back.filter(F.col("l_quantity") > 30).select("l_orderkey")
    plan = P.explain_str(filtered)
    assert any("l_quantity" in p for p in P.pushed_filters(plan)), plan
