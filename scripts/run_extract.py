#!/usr/bin/env python
"""Headless extraction job — the spark-submit entry point.

    spark-submit --py-files dist/ate_spark.zip scripts/run_extract.py \
        --input /path/to/transcripts_parquet --output /path/to/warehouse \
        [--n-buckets 32] [--salt 4] [--no-resume] [--master local[32]]

Reads the transcript table (BASELINE.json:input_hint shape), runs the
extraction pipeline (plans/pipeline.py), writes ``extracted/`` +
``lineage/`` under --output, and prints a one-line JSON summary.
Replaces the reference's CLI batch driver (/root/reference/cli.py:121-178).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="transcript extraction job")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None,
                    help="warehouse root; defaults to config warehouse.path")
    ap.add_argument("--config", default=None,
                    help="JSON config file shallow-merged over defaults "
                         "(reference text_extractor.py:778-803 contract); "
                         "explicit CLI flags override config values")
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--salt", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="spark.sql.shuffle.partitions; size to the DATA "
                         "(2-3x total cores at the data's scale), not the "
                         "cluster — oversized tasks sort/spill superlinearly")
    ap.add_argument("--ocr-fallback", default=None,
                    help="OCR engine for the scanned-PDF P3 fallback "
                         "(default config ocr.fallback_engine, 'auto'); "
                         "'none' disables")
    ap.add_argument("--warmup", action="store_true",
                    help="start the Python UDF workers before the measured "
                         "job (steady-state benchmarking)")
    args = ap.parse_args(argv)

    from advanced_text_extraction_spark.plans.pipeline import run_extract_job
    from advanced_text_extraction_spark.sources.config import load_config
    from advanced_text_extraction_spark.sources.session import build_session

    cfg = load_config(args.config)
    # The merge is shallow by reference contract (a user section replaces
    # the default section wholesale, text_extractor.py:799) — so every
    # read falls back to the package default rather than [] - indexing,
    # keeping a partial user section (e.g. {"job": {"n_buckets": 16}})
    # runnable instead of a KeyError.
    from advanced_text_extraction_spark.sources.config import DEFAULT_CONFIG
    job = cfg.get("job", {})
    job_d = DEFAULT_CONFIG["job"]
    output = (args.output
              or cfg.get("warehouse", {}).get(
                  "path", DEFAULT_CONFIG["warehouse"]["path"]))
    n_buckets = (args.n_buckets if args.n_buckets is not None
                 else job.get("n_buckets", job_d["n_buckets"]))
    salt = args.salt if args.salt is not None else job.get("salt", job_d["salt"])
    shuffle = (args.shuffle_partitions if args.shuffle_partitions is not None
               else job.get("shuffle_partitions"))
    resume = job.get("resume", True) and not args.no_resume
    ocr_cfg = cfg.get("ocr", {})
    ocr_d = DEFAULT_CONFIG["ocr"]
    ext_cfg = cfg.get("extract", {})
    ext_d = DEFAULT_CONFIG["extract"]
    ocr_engine = (args.ocr_fallback if args.ocr_fallback is not None
                  else ocr_cfg.get("fallback_engine", "auto"))
    if ocr_engine in ("none", ""):
        ocr_engine = None
    ocr_preprocess = bool(ocr_cfg.get("preprocess", ocr_d["preprocess"]))
    conf_threshold = float(ext_cfg.get(
        "confidence_threshold", ext_d["confidence_threshold"]))
    max_payload = int(ext_cfg.get(
        "max_payload_chars", ext_d["max_payload_chars"]))

    spark = build_session(app_name="ate-extract", master=args.master,
                          shuffle_partitions=shuffle,
                          arrow_batch_rows=job.get("arrow_batch_rows", 1024))
    try:
        df = spark.read.parquet(args.input)
        if args.warmup:
            from advanced_text_extraction_spark.operators.extract import extract
            n = spark.sparkContext.defaultParallelism
            (extract(df.limit(64 * n).repartition(n))
             .write.format("noop").mode("overwrite").save())
        stats = run_extract_job(
            spark, df, output,
            n_buckets=n_buckets, salt=salt,
            resume=resume,
            ocr_fallback_engine=ocr_engine,
            ocr_preprocess=ocr_preprocess,
            ocr_confidence_threshold=conf_threshold,
            max_payload_chars=max_payload,
        )
        print(json.dumps({
            "run_id": stats.run_id,
            "input_rows": stats.input_rows,
            "buckets_done": stats.buckets_done,
            "buckets_skipped": stats.buckets_skipped,
            "wall_sec": round(stats.wall_sec, 3),
            "turns_per_sec": round(stats.input_rows / stats.wall_sec, 1)
            if stats.wall_sec else None,
        }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
