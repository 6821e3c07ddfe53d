#!/usr/bin/env python
"""Synthesize the bench transcript table in an isolated JVM.

    python scripts/synth_bench_input.py --sf-dir DIR --mult K --out PATH

Run as a subprocess by bench.py --scaling so the synth JVM exits before
any measured run starts (a lingering gateway JVM after heavy GC has been
observed to wedge py4j and steal CPU from measurements). Prints ONE line:
the row count.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--mult", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--skew", action="store_true",
                    help="route ~20%% of turns into one conversation "
                         "(BASELINE.md skew fixture shape)")
    args = ap.parse_args()

    import __spark_entry__ as em
    from advanced_text_extraction_spark.sources.session import build_session

    spark = build_session(app_name="ate-bench-synth")
    try:
        tr = em.synth_transcripts(spark, args.sf_dir, mult=args.mult,
                                  skew=args.skew)
        tr.repartition(args.files).write.mode("overwrite").parquet(args.out)
        print(spark.read.parquet(args.out).count())
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
