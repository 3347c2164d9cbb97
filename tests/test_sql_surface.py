"""DataFrame and SQL declarations of the same query must agree (M3)."""

from nyc_etl_pipeline_spark.sql import monthly_sales_report_sql, register_testdata_views
from nyc_etl_pipeline_spark.suite.relational import q01_monthly_sales_report


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_equals_dataframe_flagship(spark, sf_dir):
    assert _canon(monthly_sales_report_sql(spark, sf_dir)) == _canon(
        q01_monthly_sales_report(spark, sf_dir)
    )


def test_all_testdata_views_queryable(spark, sf_dir):
    register_testdata_views(spark, sf_dir)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").first()["n"] > 0


def test_sql_window_and_lateral(spark, sf_dir):
    """SQL-only surface checks: window fn + EXISTS subquery."""
    register_testdata_views(spark, sf_dir)
    out = spark.sql("""
        SELECT n_name,
               rank() OVER (ORDER BY cnt DESC, n_name) AS r
        FROM (
          SELECT n_name, count(*) AS cnt
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY n_name
        )
    """).collect()
    assert len(out) > 0 and out[0]["r"] == 1
