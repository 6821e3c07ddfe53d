"""Window / ordering operators (SURVEY.md §2.4 W1–W4).

All built-in Catalyst window functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def restore_order(df: DataFrame) -> DataFrame:
    """W3 — stable turn-order restore (north-star requirement; reference
    sorted-file-list analog /root/reference/cli.py:430).

    Clusters each conversation's turns contiguously and in (conv_id,
    turn_idx) order *within partitions* — a sortWithinPartitions after the
    hash layout, NOT a global sort: at 10^12 rows a global orderBy is one
    giant range-shuffle for no semantic gain (consumers key by conv)."""
    return df.repartition("conv_id").sortWithinPartitions("conv_id", "turn_idx")


def with_turn_seq(df: DataFrame) -> DataFrame:
    """W4 — per-conversation display enumeration (reference
    /root/reference/gui.py:1080): row_number over the turn order."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_seq", F.row_number().over(w))


def latest_per_key(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """W1 — newest row per key (reference cache probe ORDER BY timestamp
    DESC LIMIT 1, /root/reference/text_extractor.py:1049-1054)."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def history_top_n(df: DataFrame, order_col: str, n: int,
                  preview_col: str | None = None, preview_len: int = 100) -> DataFrame:
    """W2 — history top-N with text preview (reference
    /root/reference/text_extractor.py:1086-1114): ORDER BY ts DESC LIMIT n,
    preview = text[:100]. Catalyst turns orderBy+limit into TakeOrdered —
    no global sort materializes."""
    out = df.orderBy(F.desc(order_col)).limit(n)
    if preview_col:
        out = out.withColumn(
            "preview", F.substring(F.col(preview_col), 1, preview_len)
        )
    return out
