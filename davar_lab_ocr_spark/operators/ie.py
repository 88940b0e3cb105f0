"""Information-extraction operators: key-value pairing.

The reference's TRIE pipeline (davarocr/davar_ie/models/infor_extrators/
trie/trie.py:304-420) classifies detected text boxes into key/value
node classes and relates them; CTUNet decodes an explicit relation
matrix. The geometric core both share: each value box pairs with the
best key box above-or-left of it. We express that as a declarative
join + rank (no UDF):

  value v pairs with key k minimizing
      cost = (v.y0 - k.y0 >= -tol ? weighted distance : inf)
  i.e. nearest key by (dy * 2 + |dx|) among keys not below the value,
  deterministic tie-break on key id.

Pure SQL both here and in the DuckDB oracle (query kv_pairing).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def kv_pairing(
    boxes: DataFrame,
    doc_col: str = "doc_id",
    tol: float = 4.0,
) -> DataFrame:
    """boxes: (doc_id, box_id, cls in ('key','value'), x0, y0, text).
    Returns (doc_id, value_id, key_id, key_text, value_text, cost)."""
    keys = boxes.filter(F.col("cls") == "key").select(
        F.col(doc_col).alias("doc_id"),
        F.col("box_id").alias("key_id"),
        F.col("x0").alias("kx"),
        F.col("y0").alias("ky"),
        F.col("text").alias("key_text"),
    )
    vals = boxes.filter(F.col("cls") == "value").select(
        F.col(doc_col).alias("doc_id"),
        F.col("box_id").alias("value_id"),
        F.col("x0").alias("vx"),
        F.col("y0").alias("vy"),
        F.col("text").alias("value_text"),
    )
    cand = vals.join(keys, "doc_id").filter(F.col("vy") - F.col("ky") >= -tol)
    cost = (F.col("vy") - F.col("ky")) * 2 + F.abs(F.col("vx") - F.col("kx"))
    w = Window.partitionBy("doc_id", "value_id").orderBy(
        cost.asc(), F.col("key_id").asc()
    )
    return (
        cand.withColumn("cost", F.round(cost, 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "value_id", "key_id", "key_text", "value_text", "cost")
    )
