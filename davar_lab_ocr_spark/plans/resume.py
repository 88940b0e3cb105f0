"""Snapshot-committed, resumable sink with per-partition lineage.

The reference has no job-level resume (only model-weight checkpoints,
inference.py:66-75); this is net-new per the north rule: the job must
be resumable from a committed snapshot after executor/driver loss, and
every commit carries per-partition lineage + counters.

Without an Iceberg runtime in the sandbox we implement the same
commit protocol on plain parquet:

  out_path/
    batch=<id>/            data files + _SUCCESS   (task-level commit)
    _lineage/batch=<id>/   per-partition counters  (parquet)
    _manifests/<id>.json   <- THE commit point (atomic file create,
                              written only after data+lineage land)

A batch is visible iff its manifest exists — a crash mid-write leaves
orphan files that readers never see (snapshot isolation, the
df.write.format('iceberg') analog). Resume = left-anti join of the
input's doc_ids against all committed batches' doc_ids.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .extract import extract


class SnapshotSink:
    def __init__(self, path: str):
        self.path = path
        self.manifest_dir = os.path.join(path, "_manifests")

    # -- snapshot visibility -------------------------------------------------
    def committed_batches(self) -> list[dict]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as fh:
                    out.append(json.load(fh))
        return out

    def committed_paths(self, as_of: str | None = None) -> list[str]:
        manifests = self.history()
        if as_of is not None:
            ids = [m["batch_id"] for m in manifests]
            if as_of not in ids:
                raise KeyError(f"no committed batch {as_of!r}")
            # cut by commit-log POSITION, not raw committed_at: two
            # commits inside one clock quantum (or a wall-clock step
            # backwards) would otherwise leak later batches into the
            # historical read
            manifests = manifests[: ids.index(as_of) + 1]
        return [os.path.join(self.path, f"batch={m['batch_id']}") for m in manifests]

    def history(self) -> list[dict]:
        """The commit log, oldest first (the Iceberg snapshots-table
        analog): one manifest per committed batch with counters.
        Ordered by the monotonic ``seq`` stamped at commit time — NOT by
        ``committed_at``: a wall-clock step backwards between commits
        would reorder a timestamp-sorted log and make an ``as_of`` cut
        include a later batch. Legacy manifests without ``seq`` sort
        first by (committed_at, batch_id)."""
        return sorted(
            self.committed_batches(),
            key=lambda m: (m.get("seq", -1), m["committed_at"], m["batch_id"]),
        )

    def read(self, spark: SparkSession, as_of: str | None = None) -> DataFrame | None:
        """Union of committed snapshots (uncommitted dirs invisible).
        ``as_of`` time-travels: only batches committed up to and
        including that batch_id are visible — reproduces any historical
        read of the table. Reads with mergeSchema: a later batch may
        ADD columns (the Iceberg schema-evolution analog) and earlier
        snapshots surface them as nulls."""
        paths = self.committed_paths(as_of)
        if not paths:
            return None
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def processed_doc_ids(self, spark: SparkSession) -> DataFrame | None:
        df = self.read(spark)
        return df.select("doc_id") if df is not None else None

    # -- commit --------------------------------------------------------------
    def write_batch(self, docs: DataFrame, batch_id: str | None = None) -> dict:
        """Write one snapshot: data, per-partition lineage, then the
        manifest (the commit point). Returns the manifest."""
        batch_id = batch_id or uuid.uuid4().hex[:12]
        data_path = os.path.join(self.path, f"batch={batch_id}")
        lineage_path = os.path.join(self.path, "_lineage", f"batch={batch_id}")

        # content-free span counter (SCALE.md known limit, now counted):
        # a span with empty text AND no media ref carries no content —
        # short-payload docs produce these silently in the full chain;
        # the lineage row makes them visible per partition
        n_empty = F.sum(
            F.size(
                F.filter(
                    F.col("spans"),
                    lambda s: (F.coalesce(s["text"], F.lit("")) == "")
                    & (F.coalesce(s["media_ref"], F.lit("")) == ""),
                )
            )
        ).alias("n_empty_spans")
        staged = docs.withColumn("_part", F.spark_partition_id()).persist()
        try:
            staged.drop("_part").write.mode("overwrite").parquet(data_path)
            lineage = staged.groupBy("_part").agg(
                F.count("*").alias("n_docs"),
                F.sum(F.size("spans")).alias("n_spans"),
                n_empty,
                F.min("doc_id").alias("min_doc_id"),
                F.max("doc_id").alias("max_doc_id"),
            )
            lineage.write.mode("overwrite").parquet(lineage_path)
            totals = staged.agg(
                F.count("*").alias("n_docs"),
                F.sum(F.size("spans")).alias("n_spans"),
                n_empty,
            ).collect()[0]
        finally:
            staged.unpersist()

        # monotonic commit sequence (single-writer protocol, like
        # Iceberg's snapshot sequence-number): next = max committed + 1
        prior = self.committed_batches()
        seq = max((m.get("seq", -1) for m in prior), default=-1) + 1
        manifest = {
            "batch_id": batch_id,
            "seq": seq,
            "committed_at": time.time(),
            "n_docs": totals["n_docs"],
            "n_spans": int(totals["n_spans"] or 0),
            "n_empty_spans": int(totals["n_empty_spans"] or 0),
            "data_path": data_path,
            "lineage_path": lineage_path,
        }
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".{batch_id}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.manifest_dir, f"{batch_id}.json"))
        return manifest


def run_resumable_extract(
    spark: SparkSession,
    raw: DataFrame,
    out_path: str,
    batch_id: str | None = None,
    **extract_kwargs,
) -> dict:
    """One resumable increment: skip already-committed doc_ids, extract
    the remainder, snapshot-commit. Safe to re-run after any crash —
    uncommitted partial output is invisible and re-done."""
    sink = SnapshotSink(out_path)
    processed = sink.processed_doc_ids(spark)
    # no broadcast hint: at 10^12 docs the processed set is huge — let
    # Catalyst/AQE choose (it broadcasts small sides automatically)
    todo = raw if processed is None else raw.join(processed, "doc_id", "left_anti")
    docs = extract(todo, **extract_kwargs)
    return sink.write_batch(docs, batch_id)
