"""Structured Streaming tier: the batch extraction kernels, unchanged,
over a transcript stream.

The reference is strictly batch (SURVEY §2.12) and the north rule asks
for batch-with-checkpoint-resume — that job lives in plans/pipeline.py.
This module is the forward path for continuously-arriving transcripts:
``readStream`` → the SAME ``extract()`` mapInPandas dispatch (kernels are
stream/batch agnostic) → ``writeStream`` with a checkpoint, so exactly-once
sink semantics replace the lineage table. Windowed reporting uses
watermarks to bound state for late turns.

Scale notes:
- mapInPandas on a streaming DataFrame keeps the identical Arrow batch
  shape as batch mode — no kernel changes, one code path to test.
- the per-conversation order-restore window is NOT applied in-stream
  (a global sort over an unbounded stream is undefined); order is a
  read-time concern (ORDER BY conv_id, turn_idx) or a foreachBatch
  sortWithinPartitions, matching the batch job's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.extract import extract

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), True),
    T.StructField("turn_idx", T.IntegerType(), True),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])


def read_transcript_stream(spark: SparkSession, input_path: str,
                           max_files_per_trigger: int = 32) -> DataFrame:
    """File-source stream over a transcript directory (the local stand-in
    for Kafka/Kinesis; swapping the source leaves everything below
    unchanged)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def extract_stream(stream: DataFrame) -> DataFrame:
    """The batch extraction dispatch applied to a stream — same kernels,
    same output schema."""
    return extract(stream)


def start_extraction_stream(spark: SparkSession, input_path: str,
                            output_path: str, checkpoint_path: str,
                            available_now: bool = True):
    """Run the extraction stream to parquet with exactly-once checkpoint
    semantics. ``available_now=True`` drains the current backlog and
    stops (the batch-parity mode used by tests); ``False`` runs
    continuously."""
    out = extract_stream(read_transcript_stream(spark, input_path))
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_counts(stream: DataFrame, window: str = "5 minutes",
                         watermark: str = "10 minutes") -> DataFrame:
    """Streaming reporting analog of the batch method-distribution
    summary (SURVEY §2.3 A3): turns per content type per event-time
    window. The watermark bounds state for late-arriving turns."""
    extracted = extract_stream(stream)
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "content_type")
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.avg("confidence").alias("avg_confidence"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "content_type", "n_turns", "avg_confidence")
    )


def start_windowed_counts(spark: SparkSession, input_path: str,
                          checkpoint_path: str, query_name: str,
                          window: str = "5 minutes",
                          watermark: str = "10 minutes",
                          available_now: bool = True,
                          output_mode: str = "append"):
    """Windowed counts to an in-memory sink (test/inspection surface).

    ``append`` emits a window only once the watermark passes its end
    (exactly-once, late-data-safe — the production mode); ``complete``
    re-emits all windows each trigger (bounded cardinality reporting)."""
    counts = windowed_turn_counts(
        read_transcript_stream(spark, input_path), window, watermark)
    writer = (
        counts.writeStream.format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
