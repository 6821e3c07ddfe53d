"""Reporting aggregations — SURVEY.md §2.3 (A1–A5, A8) and §2.8 (F12).

Reference analogs: batch summary (/root/reference/cli.py:233-272), language
distribution (/root/reference/cli.py:247-251,294-305), method distribution
(/root/reference/cli.py:253-256), confidence bucketing
(/root/reference/gui.py:1160-1168), GUI full summary
(/root/reference/gui.py:1098-1171).

All built-in aggregations — Catalyst gives partial+final hash aggregation
(map-side combine) for free; the pct window over an empty partition spec is
a single-row broadcast, not a real shuffle, because the groupBy output is
already tiny (distinct keys, not data rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_count, word_count


def batch_summary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A1 — one-row scalar aggregate (reference cli.py:233-272)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(char_count(F.col(text_col))).alias("total_chars"),
        F.sum(word_count(F.col(text_col))).alias("total_words"),
        F.round(F.avg(char_count(F.col(text_col))), 4).alias("avg_chars"),
        F.min(char_count(F.col(text_col))).alias("min_chars"),
        F.max(char_count(F.col(text_col))).alias("max_chars"),
    )


def distribution(df: DataFrame, key: str) -> DataFrame:
    """A2/A3 — count + percentage by key (reference cli.py:294-305).

    pct via a window over the aggregated (tiny) frame — the base table is
    scanned once."""
    agg = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return agg.withColumn(
        "pct", F.round(F.col("n") * 100.0 / F.sum("n").over(total), 4)
    )


def value_buckets(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """A4 — low/med/high bucketing (reference gui.py:1160-1168 semantics:
    [hi, inf) high, [lo, hi) medium, [0, lo) low)."""
    bucket = (
        F.when(F.col(col) >= hi, "high")
        .when(F.col(col) >= lo, "medium")
        .otherwise("low")
    )
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg(col), 4).alias("avg_value"))
    )


def full_summary(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """A5 — per-group stats in ONE pass (reference gui.py:1098-1171 computed
    four separate Python loops; here a single groupBy)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(char_count(F.col(text_col))).alias("total_chars"),
        F.sum(word_count(F.col(text_col))).alias("total_words"),
        F.round(F.avg(char_count(F.col(text_col))), 4).alias("avg_chars"),
    )
