"""Export sinks — SURVEY.md §2.6 (reference parity K2/K3/K4/K5/K6).

The reference exports a list of extraction results to JSON / CSV / TXT
(/root/reference/text_extractor.py:1139-1203) and optionally one file per
source (/root/reference/cli.py:210-231). Here every export is a DataFrame
transformation (formatting stays in WholeStageCodegen) feeding a
distributed ``df.write`` — no driver-side loop over results.

Format contracts preserved from the reference:
- CSV: newlines in text flattened to spaces
  (/root/reference/text_extractor.py:1179).
- JSON: one record object per row; the reference's envelope fields
  (export_timestamp, total_files) become a tiny driver-side manifest —
  a single envelope file is an anti-pattern at 10^12 rows.
- TXT: per-record banner + '='*80 separators
  (/root/reference/text_extractor.py:1187-1203).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import flatten_newlines

# the reference's export column set (text_extractor.py:1148-1157)
EXPORT_COLS = [
    "conv_id", "turn_idx", "role", "content_type", "extracted_text",
    "confidence", "language", "status",
]


def _project(df: DataFrame, cols: list[str] | None) -> DataFrame:
    cols = cols or [c for c in EXPORT_COLS if c in df.columns]
    return df.select(*cols)


def export_json(df: DataFrame, path: str, cols: list[str] | None = None,
                partitions: int | None = None) -> None:
    """K2 — JSON-lines export + manifest envelope (reference
    text_extractor.py:1139-1160). The record count is observed DURING the
    write (``df.observe`` — metrics ride the write job itself), not by
    reading the sink back: the previous read-back re-parsed the whole
    export with schema inference, ~tripling export cost at scale
    (VERDICT r1 #2 / ADVICE). At scale pass ``partitions`` to bound
    output file count."""
    from pyspark.sql import Observation

    out = _project(df, cols)
    if partitions:
        out = out.coalesce(partitions)
    obs = Observation()
    out = out.observe(obs, F.count(F.lit(1)).alias("n"))
    out.write.mode("overwrite").json(path)
    n = obs.get["n"]
    manifest = {
        "export_timestamp": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
        "total_records": n,
        "format": "json-lines",
    }
    _write_sidecar(path, "_manifest.json", json.dumps(manifest))


def _write_sidecar(dir_path: str, name: str, content: str) -> None:
    """Driver-side sidecar write through pyarrow's FileSystem so the
    manifest lands beside the export on ANY warehouse scheme (file://,
    s3://, hdfs://) — a local open() would raise AFTER the distributed
    write already succeeded on any non-local path."""
    from pyarrow import fs as pafs

    try:
        filesystem, base = pafs.FileSystem.from_uri(dir_path)
    except Exception:
        if "://" in dir_path:
            raise  # unmountable scheme: surface it, don't probe locally
        filesystem = pafs.LocalFileSystem()
        base = os.path.abspath(dir_path)
    with filesystem.open_output_stream(f"{base}/{name}") as f:
        f.write(content.encode())


def export_csv(df: DataFrame, path: str, cols: list[str] | None = None,
               partitions: int | None = None) -> None:
    """K3 — CSV with header; newline-flattened text (reference
    text_extractor.py:1162-1185)."""
    out = _project(df, cols)
    for field in out.schema.fields:
        if field.dataType.simpleString() == "string":
            out = out.withColumn(field.name, flatten_newlines(F.col(field.name)))
    if partitions:
        out = out.coalesce(partitions)
    out.write.mode("overwrite").option("header", True).csv(path)


def export_txt(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """K4 — human-readable text blocks with '='*80 separators (reference
    text_extractor.py:1187-1203). One formatted string column → text sink."""
    sep = "=" * 80

    def _s(col):  # NULL-safe: concat() nulls the WHOLE banner otherwise
        return F.coalesce(F.col(col).cast("string"), F.lit(""))

    block = F.concat_ws(
        "\n",
        F.lit(sep),
        F.concat(F.lit("conv: "), _s("conv_id"),
                 F.lit("  turn: "), _s("turn_idx"),
                 F.lit("  type: "), _s("content_type"),
                 F.lit("  confidence: "), _s("confidence")),
        F.lit(sep),
        F.coalesce(F.col("extracted_text"), F.lit("")),
        F.lit(""),
    )
    out = df.select(block.alias("value"))
    if partitions:
        out = out.coalesce(partitions)
    out.write.mode("overwrite").text(path)


def export_per_conversation(df: DataFrame, path: str, fmt: str = "json") -> None:
    """K5 — one output directory per conversation (the reference's
    one-file-per-source, cli.py:210-231, lifted to partition granularity:
    per-turn files at 10^12 scale are an anti-pattern; per-conversation
    partitionBy is the distributed equivalent)."""
    out = _project(df, None)
    writer = out.write.mode("overwrite").partitionBy("conv_id")
    if fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        flat = out
        for field in out.schema.fields:
            if field.dataType.simpleString() == "string":
                flat = flat.withColumn(field.name,
                                       flatten_newlines(F.col(field.name)))
        flat.write.mode("overwrite").partitionBy("conv_id") \
            .option("header", True).csv(path)
    else:
        raise ValueError(f"unsupported per-conversation format: {fmt}")


def export_combined(df: DataFrame, path: str, fmt: str = "json") -> None:
    """K6 — single combined results file (coalesce(1); test-scale only,
    reference cli.py:226-231)."""
    if fmt == "json":
        export_json(df, path, partitions=1)
    elif fmt == "csv":
        export_csv(df, path, partitions=1)
    elif fmt == "txt":
        export_txt(df, path, partitions=1)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
