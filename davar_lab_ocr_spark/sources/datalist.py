"""Datalist ingestion: davar JSON datalists -> region tables.

The davar datalist (davar_custom.py:30-63) is a single JSON object
keyed by image path, each value carrying parallel annotation arrays in
content_ann. We read it as one multiline JSON document, explode the
map into rows, and zip the parallel arrays into ONE struct array so
index alignment holds by construction (arrays_zip) — the columnar
restatement of _cvt_list (davar_custom.py:154-180).

Also: line-delimited JSON (PubTabNet jsonl), proposal side tables
(join on doc_id), and the two-level layout scan (broadcast-join the
datalist with a per-doc annotation table keyed by url,
mm_layout_loading.py:19-120).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_davar_datalist(spark: SparkSession, path: str) -> DataFrame:
    """doc-keyed datalist JSON -> rows (doc_id, width, height, regions).

    regions = arrays_zip of bboxes/cares/labels/texts (missing arrays
    become null fields; '###' marks don't-care text). The '###' comment
    key at top level is dropped (load_annotations, davar_custom.py:148).
    """
    import json

    # one JSON object keyed by arbitrary doc paths: parse driver-side
    # metadata-free via text read + from_json is impossible without a
    # schema per key, so use the JVM-side map approach: read as a single
    # string column, then explode a map<string, struct<...>>.
    raw = spark.read.option("multiLine", True).option("wholetext", True).text(path)
    ann_schema = (
        "map<string, struct<height:int, width:int, "
        "content_ann:struct<bboxes:array<array<double>>, cares:array<int>, "
        "labels:array<array<string>>, texts:array<string>>>>"
    )
    parsed = raw.select(F.from_json(F.col("value"), ann_schema).alias("m"))
    exploded = parsed.select(F.explode("m").alias("doc_id", "v")).filter(
        F.col("doc_id") != "###"
    )
    ann = F.col("v.content_ann")
    zipped = F.arrays_zip(
        ann["bboxes"].alias("bbox"),
        ann["cares"].alias("care"),
        ann["labels"].alias("label"),
        ann["texts"].alias("text"),
    )
    return exploded.select(
        "doc_id",
        F.col("v.width").alias("width"),
        F.col("v.height").alias("height"),
        zipped.alias("regions"),
    )


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Line-delimited JSON scan (PubTabNet style, test_pub.py:35-36)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def join_proposals(docs: DataFrame, proposals: DataFrame, on: str = "doc_id") -> DataFrame:
    """Preset-proposal side table equi-join (davar_custom.py:220-229)."""
    return docs.join(F.broadcast(proposals), on, "left")


def join_two_level(datalist: DataFrame, annos: DataFrame, url_col: str = "url") -> DataFrame:
    """Two-level layout scan: datalist rows reference per-doc anno JSON
    by url; broadcast-join (mm_layout_loading.py:19-120)."""
    return datalist.join(F.broadcast(annos), url_col, "left")
