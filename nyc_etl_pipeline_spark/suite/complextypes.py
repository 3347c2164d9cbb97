"""Complex-type + UDTF suite: array aggregation/manipulation and the
Python user-defined table function surface (completing the UDF / UDAF
/ UDTF trifecta — the reference had none of the three, SURVEY §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.suite import QuerySpec


def q45_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + higher-order manipulation per order:
    collect -> sort (collect_list alone is order-nondeterministic) ->
    filter/transform -> join to string (string output keeps the
    cross-engine value representation unambiguous)."""
    li = read_testdata(spark, sf_dir, "lineitem")
    lines = F.sort_array(F.collect_list("l_linenumber"))
    quantities = F.sort_array(F.collect_list("l_quantity"))
    return (
        li.groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(lines.alias("__lines"), quantities.alias("__qtys"))
        .select(
            "orderkey",
            F.size("__lines").cast("bigint").alias("n_lines"),
            F.array_join(F.transform("__lines", lambda x: x.cast("string")), ",").alias("line_list"),
            F.array_join(
                F.transform(
                    F.filter("__qtys", lambda q: q > 25),
                    lambda q: q.cast("bigint").cast("string"),
                ),
                ",",
            ).alias("big_qty_list"),
            F.element_at("__lines", 1).cast("bigint").alias("first_line"),
            F.element_at("__lines", -1).cast("bigint").alias("last_line"),
            F.array_contains("__lines", 3).alias("has_line_3"),
        )
    )


_Q45_SQL = """
WITH agg AS (
  SELECT l_orderkey AS orderkey,
         list_sort(list(l_linenumber)) AS lines,
         list_sort(list(l_quantity)) AS qtys
  FROM lineitem GROUP BY 1
)
SELECT orderkey,
       CAST(len(lines) AS BIGINT) AS n_lines,
       coalesce(array_to_string(list_transform(lines, x -> CAST(x AS VARCHAR)), ','), '') AS line_list,
       coalesce(array_to_string(list_transform(list_filter(qtys, q -> q > 25),
                                      q -> CAST(CAST(q AS BIGINT) AS VARCHAR)), ','), '') AS big_qty_list,
       CAST(lines[1] AS BIGINT) AS first_line,
       CAST(lines[-1] AS BIGINT) AS last_line,
       list_contains(lines, 3) AS has_line_3
FROM agg
"""
# NB: DuckDB array_to_string(empty_list) is NULL while Spark array_join is '' — hence the coalesce.


def q46_udtf_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> many output rows
    (per-document word counts), invoked via LATERAL join in SQL. The
    row-expansion shape a tokenizer/chunker service would use when the
    logic can't be a built-in generator like explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, n int")
    class WordCounts:
        def eval(self, text: str):
            from collections import Counter

            for w, n in sorted(Counter((text or "").split()).items()):
                yield w, int(n)

    spark.udtf.register("word_counts", WordCounts)
    read_testdata(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT d.doc_id, w.word, w.n
        FROM documents d, LATERAL word_counts(d.text) w
    """)


_Q46_SQL = """
SELECT doc_id, tok AS word, CAST(count(*) AS INTEGER) AS n
FROM (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
)
GROUP BY 1, 2
"""


SPECS = [
    QuerySpec("q45_array_ops", q45_array_ops, _Q45_SQL,
              "array agg + higher-order ops (sorted, deterministic)"),
    QuerySpec("q46_udtf_word_counts", q46_udtf_word_counts, _Q46_SQL,
              "Python UDTF row expansion via LATERAL"),
]
