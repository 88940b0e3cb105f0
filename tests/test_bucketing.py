"""Bucketed co-located join: no shuffle exchange in the physical plan
(broadcast disabled so the sort-merge path is exercised — bucketing
matters precisely when neither side is broadcastable)."""

import pyspark.sql.functions as F

from davar_lab_ocr_spark.sources.datalist import write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("meta")
    )
    anns = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("ann")
    )
    write_bucketed(docs, "b_docs", "doc_id", 8)
    write_bucketed(anns, "b_anns", "doc_id", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_docs").join(spark.table("b_anns"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 2000
        # contrast: the un-bucketed join shuffles both sides
        plain = docs.join(anns, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
