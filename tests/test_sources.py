"""Datalist ingestion tests: davar JSON -> region table, recognition
File-flavor explode, proposal join."""

import json

import pyspark.sql.functions as F

from davar_lab_ocr_spark.sources.datalist import (
    join_proposals,
    rcg_file_to_rows,
    rcg_filter,
    read_davar_datalist,
)

SAMPLE = {
    "###": "comment line that must be dropped",
    "Images/train/img1.jpg": {
        "height": 534,
        "width": 616,
        "content_ann": {
            "bboxes": [[1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 1.0, 4.0], [5.0, 5.0, 9.0, 9.0]],
            "cares": [1, 0],
            "labels": [["title"], ["code"]],
            "texts": ["apple", "###"],
        },
    },
    "Images/train/img2.jpg": {
        "height": 100,
        "width": 200,
        "content_ann": {
            "bboxes": [[0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]],
            "cares": [1],
            "labels": [["x"]],
            "texts": ["Banana"],
        },
    },
}


def _write_sample(tmp_path):
    p = tmp_path / "datalist.json"
    p.write_text(json.dumps(SAMPLE))
    return str(p)


def test_read_davar_datalist(spark, tmp_path):
    df = read_davar_datalist(spark, _write_sample(tmp_path))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {"Images/train/img1.jpg", "Images/train/img2.jpg"}
    r1 = rows["Images/train/img1.jpg"]
    assert (r1["width"], r1["height"]) == (616, 534)
    assert len(r1["regions"]) == 2
    assert r1["regions"][0]["text"] == "apple" and r1["regions"][0]["care"] == 1
    assert r1["regions"][1]["text"] == "###" and r1["regions"][1]["care"] == 0
    assert list(r1["regions"][0]["bbox"]) == [1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 1.0, 4.0]


def test_rcg_file_flavor(spark, tmp_path):
    docs = read_davar_datalist(spark, _write_sample(tmp_path))
    rows = rcg_file_to_rows(docs, sensitive=False).collect()
    # img1: care=0 dropped AND 4-point bbox dropped anyway; img2 kept, lowercased
    texts = sorted(r["text"] for r in rows)
    assert texts == ["apple", "banana"]
    filtered = rcg_filter(
        rcg_file_to_rows(docs, sensitive=False), max_len=25, charset="a-z"
    ).collect()
    assert sorted(r["text"] for r in filtered) == ["apple", "banana"]
    assert rcg_filter(rcg_file_to_rows(docs), max_len=5).count() == 1  # 'Banana' len 6


def test_join_proposals(spark, tmp_path):
    docs = read_davar_datalist(spark, _write_sample(tmp_path))
    props = spark.createDataFrame(
        [("Images/train/img1.jpg", [0.1, 0.2])], "doc_id string, proposal array<double>"
    )
    out = join_proposals(docs, props)
    got = {r["doc_id"]: r["proposal"] for r in out.collect()}
    assert got["Images/train/img1.jpg"] == [0.1, 0.2]
    assert got["Images/train/img2.jpg"] is None
