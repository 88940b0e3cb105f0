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


def test_eval_archive_roundtrip(spark, tmp_path):
    """zip sink -> source roundtrip preserves every detection line and
    feeds det_hmean identically to the in-memory path."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.sources.datalist import (
        read_eval_archive,
        write_eval_archive,
    )

    rows = [
        ("img_1", [10.0, 10.0, 60.0, 10.0, 60.0, 30.0, 10.0, 30.0], 0.92, "hello"),
        ("img_1", [100.0, 10.0, 160.0, 10.0, 160.0, 30.0, 100.0, 30.0], 0.7, "wor,ld"),
        ("img_2", [5.0, 5.0, 50.0, 5.0, 50.0, 25.0, 5.0, 25.0], 0.55, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, poly array<double>, conf double, text string")
    zp = str(tmp_path / "pred.zip")
    assert write_eval_archive(df, zp) == 2

    back = read_eval_archive(spark, zp).orderBy("doc_id", "conf")
    got = [(r["doc_id"], r["poly"], r["conf"], r["text"]) for r in back.collect()]
    want = sorted(rows, key=lambda t: (t[0], t[2]))
    assert [g[0] for g in got] == [w[0] for w in want]
    assert [g[1] for g in got] == [w[1] for w in want]
    assert [round(g[2], 6) for g in got] == [w[2] for w in want]
    assert [g[3] for g in got] == [w[3] for w in want]  # comma in text survives


def test_eval_archive_commas_and_nulls(spark, tmp_path):
    from davar_lab_ocr_spark.sources.datalist import (
        read_eval_archive,
        write_eval_archive,
    )

    rows = [
        ("img_1", [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], 0.5, "a,b,,c"),
        ("img_1", [1.0, 2.0, 3.0, 4.0], 0.25, None),  # null text
        ("img_2", [0.0, 0.0, 9.0, 0.0, 9.0, 9.0, 0.0, 9.0], 0.75, "42"),  # numeric text
    ]
    df = spark.createDataFrame(rows, "doc_id string, poly array<double>, conf double, text string")
    zp = str(tmp_path / "c.zip")
    write_eval_archive(df, zp)
    got = {
        (r["doc_id"], r["conf"]): (r["poly"], r["text"])
        for r in read_eval_archive(spark, zp).collect()
    }
    assert got[("img_1", 0.5)] == ([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], "a,b,,c")
    assert got[("img_1", 0.25)] == ([1.0, 2.0, 3.0, 4.0], "")
    assert got[("img_2", 0.75)] == ([0.0, 0.0, 9.0, 0.0, 9.0, 9.0, 0.0, 9.0], "42")
