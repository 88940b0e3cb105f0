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


_REGIONS_TYPE = (
    "array<struct<bbox:array<double>, care:int, "
    "label:array<string>, text:string, cell:array<int>, "
    "relation:array<int>>>"
)
# ``url``: two-level layout datalists (VSR / PubLayNet) point each doc
# at a per-doc annotation JSON (mm_layout_loading.py); null elsewhere
DATALIST_SCHEMA = (
    f"doc_id string, width int, height int, url string, regions {_REGIONS_TYPE}"
)
LAYOUT_ANNO_SCHEMA = (
    f"url string, width int, height int, regions {_REGIONS_TYPE}, "
    "layout array<struct<care:int, label:array<string>, "
    "segboxes:array<array<double>>>>"
)


def _build_regions(ann: dict) -> list[dict]:
    bboxes = ann.get("bboxes", []) or []
    n = len(bboxes)
    cares = ann.get("cares") or [1] * n
    labels = ann.get("labels") or [None] * n
    texts = ann.get("texts") or [""] * n
    # table datalists (PubTabNet) carry per-region cell spans
    # [start_row, start_col, end_row, end_col]; table UNDERSTANDING
    # datalists (ComFinTab / CTUNet) additionally carry per-region
    # relation rows (the adjacency matrix)
    cells = ann.get("cells") or [None] * n
    relations = ann.get("relations") or [None] * n
    return [
        {
            "bbox": [float(x) for x in bboxes[i]],
            "care": int(cares[i]),
            "label": [str(x) for x in labels[i]] if labels[i] is not None else None,
            "text": texts[i],
            "cell": cells[i],
            "relation": relations[i],
        }
        for i in range(n)
    ]


def read_davar_datalist(spark: SparkSession, path: str) -> DataFrame:
    """doc-keyed datalist JSON -> rows (doc_id, width, height, regions).

    The datalist is one JSON object with arbitrary doc-path keys and a
    top-level '###' comment key (dropped; load_annotations,
    davar_custom.py:141-152), so a fixed from_json schema can't parse
    it. Datalist files are small metadata (the heavy payloads live
    behind media refs) — wholeTextFiles distributes per-file python
    parsing across executors, the row conversion mirrors _cvt_list
    (davar_custom.py:154-180): parallel content_ann arrays zip into one
    struct array, missing arrays default (cares -> 1, labels/texts ->
    null/'')."""
    import json

    def parse(pair):
        _fname, text = pair
        data = json.loads(text)
        for doc_id, v in data.items():
            if doc_id == "###" or not isinstance(v, dict):
                continue
            regions = _build_regions(v.get("content_ann", {}) or {})
            yield (doc_id, v.get("width"), v.get("height"), v.get("url"), regions)

    rdd = spark.sparkContext.wholeTextFiles(path).flatMap(parse)
    return spark.createDataFrame(rdd, schema=DATALIST_SCHEMA)


def read_layout_annos(spark: SparkSession, path_glob: str) -> DataFrame:
    """Second level of the VSR two-level layout scan: ONE annotation
    JSON per doc (mm_layout_loading.py:19-120; PubLayNet Annos/*),
    keyed by its filename — the ``url`` the top datalist points at.
    Carries token-level ``content_ann`` regions plus layout-level
    ``content_ann2`` (category labels + polygon segboxes)."""
    import json

    def parse(pair):
        fname, text = pair
        v = json.loads(text)
        url = fname.rsplit("/", 1)[-1]
        regions = _build_regions(v.get("content_ann", {}) or {})
        ann2 = v.get("content_ann2", {}) or {}
        seg = ann2.get("segboxes", []) or []
        labels2 = ann2.get("labels") or [None] * len(seg)
        n2 = max(len(seg), len(labels2))
        cares2 = ann2.get("cares") or [1] * n2
        layout = [
            {
                "care": int(cares2[i]) if i < len(cares2) else 1,
                "label": [str(x) for x in labels2[i]] if i < len(labels2) and labels2[i] else None,
                "segboxes": [[float(x) for x in p] for p in seg[i]] if i < len(seg) else None,
            }
            for i in range(n2)
        ]
        yield (url, v.get("width"), v.get("height"), regions, layout)

    rdd = spark.sparkContext.wholeTextFiles(path_glob).flatMap(parse)
    return spark.createDataFrame(rdd, schema=LAYOUT_ANNO_SCHEMA)


def read_nlp_datalist(spark: SparkSession, path: str) -> DataFrame:
    """NLP (NER) datalist JSON -> rows (doc_id, seq, tokens, tags).

    The reference's NER demos ship doc-keyed datalists whose values
    carry ``nlp_ann`` (parallel ``tokens`` and ``tokens_labels``
    sequence lists; labels are single-element lists in IOBES scheme —
    demo/ner/data/CoNLL2003/Datalist). One row per (doc, sequence);
    same wholeTextFiles distribution as read_davar_datalist."""
    import json

    def parse(pair):
        _fname, text = pair
        data = json.loads(text)
        for doc_id, v in data.items():
            if doc_id == "###" or not isinstance(v, dict):
                continue
            ann = v.get("nlp_ann", {}) or {}
            toks = ann.get("tokens", []) or []
            labs = ann.get("tokens_labels", []) or []
            for seq_i, seq_toks in enumerate(toks):
                seq_labs = labs[seq_i] if seq_i < len(labs) else []
                yield (
                    doc_id,
                    seq_i,
                    list(seq_toks),
                    [(lab[0] if lab else "O") for lab in seq_labs],
                )

    rdd = spark.sparkContext.wholeTextFiles(path).flatMap(parse)
    return spark.createDataFrame(
        rdd, schema="doc_id string, seq int, tokens array<string>, tags array<string>"
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


def rcg_file_to_rows(docs: DataFrame, sensitive: bool = True) -> DataFrame:
    """Recognition 'File' datalist flavor (davar_rcg_dataset.py:313-351):
    explode per-instance (filename, text, bbox, label, care); drop
    don't-care and non-8-point boxes; optional case fold. Input rows
    follow read_davar_datalist's shape."""
    exploded = docs.select(
        F.col("doc_id").alias("filename"),
        "width",
        "height",
        F.explode("regions").alias("r"),
    ).filter((F.col("r.care") == 1) & (F.size("r.bbox") == 8))
    text = F.col("r.text") if sensitive else F.lower(F.col("r.text"))
    return exploded.select(
        "filename",
        "width",
        "height",
        text.alias("text"),
        F.col("r.bbox").alias("bbox"),
        F.col("r.label").alias("label"),
    )


def rcg_filter(df: DataFrame, max_len: int | None = 25, charset: str | None = None) -> DataFrame:
    """Recognition per-record filters (length cap, unsupported chars),
    davar_rcg_dataset.py:354-489 Tight/Loose flavors share these."""
    out = df
    if max_len is not None:
        out = out.filter(F.length("text") <= max_len)
    if charset is not None:
        from ..operators.filters import _charset_class

        out = out.filter(~F.col("text").rlike(_charset_class(charset)))
    return out


def rcg_lmdb_scan(spark: SparkSession, lmdb_path: str) -> DataFrame:
    """Scan a recognition LMDB store (davar_loading_lmdb.py:23-302 key
    scheme: 'num-samples', 'image-%09d', 'label-%09d') into rows
    (sample_id, image binary, label) using the pure-stdlib parser in
    sources/lmdb_format.py — no lmdb C library needed for the read
    path. The data file rides to an executor via binaryFile (a single
    LMDB file is not splittable; the ETL's parallelism comes from
    writing many output partitions, and from many input STORES — the
    reference ships one store per dataset), and the join of image/label
    keys happens inside the Arrow batch, so nothing row-sized touches
    the driver."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(lmdb_path)

    def run(batches):
        from .lmdb_format import lmdb_items

        for batch in batches:
            for buf in batch.column("content").to_pylist():
                images: dict[int, bytes] = {}
                labels: dict[int, str] = {}
                for k, v in lmdb_items(buf):
                    ks = k.decode("latin-1")
                    if ks.startswith("image-"):
                        images[int(ks[6:])] = v
                    elif ks.startswith("label-"):
                        labels[int(ks[6:])] = v.decode("utf-8")
                ids = sorted(images)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids, pa.int64()),
                        pa.array([images[i] for i in ids], pa.binary()),
                        pa.array([labels.get(i) for i in ids], pa.string()),
                    ],
                    names=["sample_id", "image", "label"],
                )

    return files.select("content").mapInArrow(
        run, schema="sample_id long, image binary, label string"
    )


def lmdb_etl(spark: SparkSession, lmdb_path: str, out_path: str) -> None:
    """One-time LMDB -> parquet conversion (the 100TB design converts
    once, then everything downstream is columnar): scan the store with
    the stdlib parser, write a binary image column + label."""
    rcg_lmdb_scan(spark, lmdb_path).write.mode("overwrite").parquet(out_path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str = "doc_id", n_buckets: int = 16) -> None:
    """Persist a table bucketed+sorted by the join key. Two tables
    bucketed the same way join with ZERO exchanges (co-located
    sort-merge join) — the 100TB recipe for repeated doc_id joins
    (annotations x media, raw x processed-ids, ...)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale managed-table directory (e.g. from a crashed run whose
    # metastore is gone) blocks re-creation; clear it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        f"{warehouse.removeprefix('file:')}/{table}", ignore_errors=True
    )
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


# ---------------------------------------------------------------------------
# evaluation archives (IC15-style zipped per-image txt submissions)
# ---------------------------------------------------------------------------
EVAL_ARCHIVE_SCHEMA = (
    "doc_id string, poly array<double>, conf double, text string"
)


def write_eval_archive(df: DataFrame, zip_path: str, conf_col: str | None = "conf") -> int:
    """documents of detections -> one zip of per-image ``res_<doc>.txt``
    files, each line ``x1,y1,...,xn,yn[,conf][,text]`` — the submission
    format the reference's offline eval scripts consume
    (demo/text_detection/evaluation: gt/*.zip + pred/*.zip).

    Eval archives are driver-scale artifacts (KB-MB), so the rows are
    streamed through toLocalIterator after a per-doc groupBy — the heavy
    lifting (decode + per-doc line assembly) stays distributed; only the
    final zip packing is driver-side. Returns number of entries.
    """
    import zipfile

    import pyspark.sql.functions as F

    line = F.concat_ws(
        ",",
        F.concat_ws(",", F.transform("poly", lambda v: v.cast("int").cast("string"))),
        *(
            [F.coalesce(F.round(F.col(conf_col), 6), F.lit(0.0)).cast("string")]
            if conf_col
            else []
        ),
        # concat_ws silently drops NULLs, which would shift every field
        # after it — coalesce keeps the column count fixed
        F.coalesce(F.col("text"), F.lit("")),
    )
    per_doc = (
        df.select("doc_id", line.alias("line"))
        .groupBy("doc_id")
        .agg(F.concat_ws("\n", F.collect_list("line")).alias("body"))
        .orderBy("doc_id")
    )
    n = 0
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for row in per_doc.toLocalIterator():
            zf.writestr(f"res_{row['doc_id']}.txt", row["body"])
            n += 1
    return n


def read_eval_archive(spark: SparkSession, zip_path: str, has_conf: bool = True) -> DataFrame:
    """zip of per-image txt files -> rows (doc_id, poly, conf, text).
    Entries parallelize across executors after a driver-side listing
    (archive members are the unit of work, like a file listing)."""
    import zipfile

    with zipfile.ZipFile(zip_path) as zf:
        entries = [(name, zf.read(name).decode("utf-8")) for name in sorted(zf.namelist())]

    def parse(pair):
        name, body = pair
        doc_id = name.rsplit("/", 1)[-1]
        if doc_id.startswith("res_"):
            doc_id = doc_id[4:]
        if doc_id.endswith(".txt"):
            doc_id = doc_id[:-4]
        def numeric_prefix_len(parts):
            n = 0
            for p in parts:
                try:
                    float(p)
                except ValueError:
                    break
                n += 1
            return n

        out = []
        for ln in body.splitlines():
            if not ln.strip():
                continue
            parts = ln.split(",")
            # parse from the LEFT: the transcription may itself contain
            # commas, so field positions cannot be derived from the
            # total comma count. The polygon is the longest even run of
            # leading numeric fields (minus the conf slot); everything
            # after it is the text. A fully-numeric transcription is
            # ambiguous in this format — one trailing numeric field is
            # reserved for it when the prefix length allows.
            n_num = numeric_prefix_len(parts)
            reserve = 1 if has_conf else 0
            n_pts = max((n_num - reserve) // 2 * 2, 0)
            poly = [float(v) for v in parts[:n_pts]]
            if has_conf:
                conf = float(parts[n_pts]) if n_pts < len(parts) else 1.0
                text = ",".join(parts[n_pts + 1 :])
            else:
                conf = 1.0
                text = ",".join(parts[n_pts:])
            out.append((doc_id, poly, conf, text))
        return out

    rdd = spark.sparkContext.parallelize(entries, max(len(entries) // 4, 1)).flatMap(parse)
    return spark.createDataFrame(rdd, EVAL_ARCHIVE_SCHEMA)


def eval_archive_pairs(
    spark: SparkSession,
    gt_zip: str,
    pred_zip: str,
    has_conf: bool = False,
    gt_id_strip: str = "^poly_gt_",
) -> DataFrame:
    """gt + pred eval archives -> eval_pairs rows (doc_id, pred[], gt[])
    ready for det_hmean / det_eval_full. Mirrors the reference
    harness's sample-name normalization (script.py GT_SAMPLE_NAME_2_ID
    'poly_gt_img([0-9]+).txt' vs DET 'img([0-9]+).txt'): ``gt_id_strip``
    is regex-removed from gt doc ids before the join. GT rows with
    transcription '###' stay in the frame as don't-care (care=1 +
    text='###' — the matcher's dontcare rule). Docs with gt but no
    predictions keep an empty pred array (left join), matching the
    reference's missing-submission handling."""
    import pyspark.sql.functions as F

    gt = read_eval_archive(spark, gt_zip, has_conf=has_conf).withColumn(
        "doc_id", F.regexp_replace("doc_id", gt_id_strip, "")
    )
    pred = read_eval_archive(spark, pred_zip, has_conf=has_conf)
    gtg = gt.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("poly"), F.lit(1).alias("care"), F.col("text"))
        ).alias("gt")
    )
    pg = pred.groupBy("doc_id").agg(
        F.collect_list(F.struct(F.col("poly"), F.col("conf"), F.col("text"))).alias("pred")
    )
    return gtg.join(pg, "doc_id", "left").withColumn(
        "pred", F.coalesce(F.col("pred"), F.array().cast(pg.schema["pred"].dataType))
    )


def read_track_results(spark: SparkSession, path: str) -> DataFrame:
    """Videotext track-result JSON ({video: {track_id: {'track': [...],
    'scores': [...]?, 'text': str?}}} — the format of the reference's
    shipped demo/videotext/evaluation/pred/ files) -> rows (video_id,
    track_id, track array<string>, scores array<double>, text). The
    file rides to an executor whole via binaryFile (one json is one
    work unit; corpus parallelism comes from many files — pass a glob),
    and parsing happens inside the Arrow batch."""
    import json as _json

    import pyarrow as pa
    import pyspark.sql.types as T

    files = spark.read.format("binaryFile").load(path).select("content")
    schema = T.StructType(
        [
            T.StructField("video_id", T.StringType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("track_id", T.StringType()),
            T.StructField("track", T.ArrayType(T.StringType())),
            T.StructField("scores", T.ArrayType(T.DoubleType())),
            T.StructField("text", T.StringType()),
        ]
    )

    def run(batches):
        for batch in batches:
            for buf in batch.column("content").to_pylist():
                data = _json.loads(buf.decode("utf-8"))
                vids, seqs, tids, tracks, scores, texts = [], [], [], [], [], []
                for video_id, track_map in data.items():
                    for i, (track_id, rec) in enumerate(track_map.items()):
                        vids.append(video_id)
                        seqs.append(i)
                        tids.append(str(track_id))
                        tracks.append(list(rec["track"]))
                        scores.append(
                            [float(s) for s in rec["scores"]]
                            if "scores" in rec
                            else None
                        )
                        texts.append(rec.get("text"))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(vids, pa.string()),
                        pa.array(seqs, pa.int32()),
                        pa.array(tids, pa.string()),
                        pa.array(tracks, pa.list_(pa.string())),
                        pa.array(scores, pa.list_(pa.float64())),
                        pa.array(texts, pa.string()),
                    ],
                    names=["video_id", "seq", "track_id", "track", "scores", "text"],
                )

    return files.mapInArrow(run, schema=schema)
