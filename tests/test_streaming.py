"""Structured Streaming tier: stream/batch parity of the extraction
kernels (same mapInPandas dispatch), exactly-once checkpointing, and the
watermarked windowed reporting aggregation."""

from __future__ import annotations

import pandas as pd
import pytest

from advanced_text_extraction_spark.operators.extract import extract
from advanced_text_extraction_spark.streaming import extract_stream as ST


@pytest.fixture(scope="module")
def stream_dirs(transcripts_pdf, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp = root / "in"
    inp.mkdir()
    # two arrival batches → two files, exercising multi-trigger intake
    half = len(transcripts_pdf) // 2
    transcripts_pdf.iloc[:half].to_parquet(inp / "a.parquet", index=False)
    transcripts_pdf.iloc[half:].to_parquet(inp / "b.parquet", index=False)
    return str(inp), str(root / "out"), str(root / "ckpt")


def test_stream_batch_parity(spark, stream_dirs, transcripts_path):
    inp, out, ckpt = stream_dirs
    q = ST.start_extraction_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out).toPandas()
    batch = extract(spark.read.parquet(transcripts_path)).toPandas()

    key = ["conv_id", "turn_idx"]
    cols = key + ["content_type", "extracted_text", "confidence", "language",
                  "status"]
    a = streamed[cols].sort_values(key).reset_index(drop=True)
    b = batch[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stream_checkpoint_no_reprocess(spark, stream_dirs):
    """A second availableNow run from the same checkpoint sees no new
    files → appends nothing (exactly-once over the file source)."""
    inp, out, ckpt = stream_dirs
    n_before = spark.read.parquet(out).count()
    q = ST.start_extraction_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_windowed_counts_watermark(spark, stream_dirs):
    inp, _, _ = stream_dirs
    import uuid

    name = f"wc_{uuid.uuid4().hex[:8]}"
    ckpt = f"/tmp/{name}_ckpt"
    q = ST.start_windowed_counts(spark, inp, ckpt, name,
                                 window="10 minutes", watermark="1 hour",
                                 output_mode="complete")
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    assert len(got) > 0
    assert set(got.columns) == {"window_start", "window_end", "content_type",
                                "n_turns", "avg_confidence"}
    # complete mode re-emits every window → totals cover every turn once
    n_input = spark.read.parquet(inp).count()
    assert got["n_turns"].sum() == n_input


def test_windowed_counts_append_holds_open_windows(spark, stream_dirs):
    """Append mode must NOT emit windows the watermark hasn't passed —
    emitted turns are a strict subset of the input."""
    inp, _, _ = stream_dirs
    import uuid

    name = f"wa_{uuid.uuid4().hex[:8]}"
    q = ST.start_windowed_counts(spark, inp, f"/tmp/{name}_ckpt", name,
                                 window="10 minutes", watermark="1 hour")
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    n_input = spark.read.parquet(inp).count()
    assert 0 < got["n_turns"].sum() < n_input
