"""Round-6 measurement harness (guide §1) — NOT the driver bench.

Times each headline query in isolation with the noop sink
(computation only, no sink cost), over N interleaved suite passes so
per-query minima land in different host-contention windows, and dumps
``explain("formatted")`` for each query to plans/r06/.

Usage:
  python bench_extra.py               # time all headline queries, 3 passes
  python bench_extra.py --plans TAG   # dump plans/r06/<query>_<TAG>.txt
  python bench_extra.py --q ap_sweep  # time a single query, 5 passes
  python bench_extra.py --extract     # time the flagship extract (noop)

Output: one JSON line {"queries": {name: min_sec}, "passes": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

HEADLINE = [
    "pricing_summary", "region_revenue", "top_orders_per_customer",
    "tokenize_spans", "token_stats", "quality_score", "repetition_stats",
    "exact_dedup", "ngram_jaccard", "minhash_lsh", "simhash",
    "doc_fingerprint", "embedding_topk", "ann_lsh", "iou_match_join",
    "sessionize", "ap_sweep", "map_sweep", "recall_at_k", "char_voting",
]


def _spark():
    from davar_lab_ocr_spark.session import get_spark

    return get_spark("bench-extra", parallelism=CPUS)


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    only = None
    do_extract = False
    passes = int(os.environ.get("BENCH_EXTRA_PASSES", "3"))
    it = iter(args)
    for a in it:
        if a == "--plans":
            plans_tag = next(it)
        elif a == "--q":
            only = next(it).split(",")
            passes = max(passes, 5)
        elif a == "--extract":
            do_extract = True
        elif a == "--passes":
            passes = int(next(it))

    import __spark_entry__ as E

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    requested = only or HEADLINE
    unknown = [n for n in requested if n not in qs]
    if unknown:
        raise SystemExit(f"unknown query name(s): {unknown}")
    names = list(requested)

    # warm: JVM JIT, python workers, parquet footers/page cache
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    if "tokenize_spans" in qs:
        qs["tokenize_spans"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    if plans_tag:
        os.makedirs(PLANS_DIR, exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(PLANS_DIR, f"{name}_{plans_tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        print(json.dumps({"plans": len(names), "tag": plans_tag}))

    timings: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    result = {
        "queries": {n: min(v) for n, v in timings.items()},
        "samples": timings,
        "passes": passes,
        "total_min": round(sum(min(v) for v in timings.values()), 3),
    }

    if do_extract:
        from davar_lab_ocr_spark.plans.extract import extract

        corpus = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "_bench_data", "corpus_240000"
        )
        raw = spark.read.parquet(corpus)
        extract(raw.limit(30000)).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(max(passes, 3)):
            spark.sparkContext.setJobDescription("bench_extra:extract_noop")
            t0 = time.time()
            extract(raw).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out = "/dev/shm/spark_bench_extra_out" if os.path.isdir("/dev/shm") else "/tmp/spark_bench_extra_out"
        tp = []
        for _ in range(max(passes, 3)):
            spark.sparkContext.setJobDescription("bench_extra:extract_parquet")
            t0 = time.time()
            extract(raw).write.mode("overwrite").parquet(out)
            tp.append(round(time.time() - t0, 3))
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        result["extract_noop"] = {"min": min(ts), "samples": ts}
        result["extract_parquet"] = {"min": min(tp), "samples": tp}

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
