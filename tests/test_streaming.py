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


def test_windowed_counts_batch_equals_streaming(spark, stream_dirs,
                                                transcripts_path):
    """The batch tier (operators.windows.windowed_counts_batch — the
    driver-gated surface) must reproduce the streaming complete-mode
    windowed counts exactly: same F.window tumbling buckets, same
    per-(window, content_type) totals and means."""
    import uuid

    from advanced_text_extraction_spark.operators import windows as W

    inp, _, _ = stream_dirs
    name = f"wb_{uuid.uuid4().hex[:8]}"
    q = ST.start_windowed_counts(spark, inp, f"/tmp/{name}_ckpt", name,
                                 window="10 minutes", watermark="1 hour",
                                 output_mode="complete")
    q.awaitTermination(120)
    streamed = spark.sql(f"SELECT * FROM {name}").toPandas()

    batch = W.windowed_counts_batch(
        extract(spark.read.parquet(transcripts_path)),
        "ts", "content_type", "confidence", window_sec=600
    ).toPandas().rename(columns={"n_rows": "n_turns",
                                 "avg_val": "avg_confidence"})

    key = ["window_start", "content_type"]
    a = streamed.sort_values(key).reset_index(drop=True)
    b = batch[a.columns].sort_values(key).reset_index(drop=True)
    # the batch tier rounds the mean to 6dp for oracle parity; round the
    # streaming side the same way before comparing
    a["avg_confidence"] = a["avg_confidence"].round(6)
    pd.testing.assert_frame_equal(a, b)


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


# ---------------------------------------------------------------------------
# custom stateful operator: sessionization (applyInPandasWithState)
# ---------------------------------------------------------------------------

def _write_turns(path, rows):
    from datetime import datetime, timezone

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                     "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["tool"] = df["tool"].astype("string")
    df["ts"] = pd.to_datetime(df["ts"], utc=True).astype("datetime64[us, UTC]")
    df.to_parquet(path, index=False)


def test_sessionizer_state_recovery_and_timeout(spark, tmp_path):
    """Two availableNow runs against one checkpoint: open sessions must
    survive the restart via the state store, and the event-time timeout
    (watermark past last_ts + gap) closes them on the second run."""
    from datetime import datetime, timezone

    def ts(mins):
        return datetime(2026, 1, 1, tzinfo=timezone.utc) \
            + pd.Timedelta(minutes=mins)

    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _write_turns(inp / "b1.parquet",
                 [("A", 0, "user", "hello there", None, ts(0)),
                  ("A", 1, "assistant", "hi!", None, ts(1)),
                  ("B", 0, "user", "xxxx", None, ts(2))])
    q = ST.start_sessionizer(spark, str(inp), out, ckpt,
                             gap_ms=5 * 60 * 1000)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 0  # all sessions still open

    # B continues within its gap; C arrives an hour later, advancing the
    # watermark far past A's and B's gap -> both time out and close
    _write_turns(inp / "b2.parquet",
                 [("B", 1, "assistant", "yy", None, ts(3)),
                  ("C", 0, "user", "zzz", None, ts(60))])
    q = ST.start_sessionizer(spark, str(inp), out, ckpt,
                             gap_ms=5 * 60 * 1000)
    q.awaitTermination(120)
    sessions = {r.conv_id: r for r in spark.read.parquet(out).collect()}
    assert set(sessions) == {"A", "B"}  # C is still open
    assert sessions["A"].n_turns == 2 and sessions["A"].n_chars == 14
    # B's state merged across the restart: batch-1 turn + batch-2 turn
    assert sessions["B"].n_turns == 2 and sessions["B"].n_chars == 6
    assert all(r.closed for r in sessions.values())
    assert sessions["A"].first_ts == ts(0).replace(tzinfo=None) or \
        sessions["A"].first_ts is not None


def test_sessionizer_progress_mode(spark, tmp_path):
    """update-mode progress rows: every live conversation emits an open
    row per trigger; closed rows appear once their timeout fires."""
    from datetime import datetime, timezone

    def ts(mins):
        return datetime(2026, 1, 1, tzinfo=timezone.utc) \
            + pd.Timedelta(minutes=mins)

    inp = tmp_path / "in"
    inp.mkdir()
    _write_turns(inp / "b1.parquet",
                 [("A", 0, "user", "one", None, ts(0)),
                  ("B", 0, "user", "two", None, ts(40))])
    sessions = ST.sessionize_conversations(
        ST.read_transcript_stream(spark, str(inp), max_files_per_trigger=1),
        gap_ms=5 * 60 * 1000, emit_progress=True)
    q = (sessions.writeStream.format("memory").queryName("sess_prog")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.conv_id, r.closed)
            for r in spark.sql("select * from sess_prog").collect()}
    # A opened, then closed by B's watermark advance; B still open
    assert ("A", False) in rows and ("B", False) in rows
    assert ("A", True) in rows and ("B", True) not in rows


def test_sessionizer_null_ts_after_watermark_advance(spark, tmp_path):
    """Regression (review r2): a null-ts turn for a PAST-DUE session,
    processed in a batch whose watermark already exceeds the session's
    stale last_ts+gap, must not kill the query. Pre-fix, the kernel
    re-armed the timeout with the stale timestamp and
    setTimeoutTimestamp raised below the watermark. maxFilesPerTrigger=1
    forces the watermark-advancing file and the null-ts file into
    separate batches of ONE run."""
    import os as _os
    import time as _time
    from datetime import datetime, timezone

    def ts(mins):
        return datetime(2026, 1, 1, tzinfo=timezone.utc) \
            + pd.Timedelta(minutes=mins)

    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    gap = 5 * 60 * 1000
    # run 1: open session A
    _write_turns(inp / "b1.parquet",
                 [("A", 0, "user", "hello", None, ts(0))])
    q = ST.start_sessionizer(spark, str(inp), out, ckpt, gap_ms=gap)
    q.awaitTermination(120)

    # run 2, batch 1: C pushes the watermark an hour forward;
    # batch 2: a null-ts turn for A arrives under that watermark
    _write_turns(inp / "b2.parquet",
                 [("C", 0, "user", "zzz", None, ts(60))])
    _write_turns(inp / "b3.parquet",
                 [("A", 1, "assistant", "late-null", None, None)])
    now = _time.time()
    _os.utime(inp / "b2.parquet", (now - 20, now - 20))
    _os.utime(inp / "b3.parquet", (now, now))
    sessions = ST.sessionize_conversations(
        ST.read_transcript_stream(spark, str(inp), max_files_per_trigger=1),
        gap_ms=gap, emit_progress=False)
    q = (sessions.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)  # pre-fix: StreamingQueryException here
    # A re-armed at watermark+1 (not the stale timestamp), so a later
    # watermark-advancing run closes it instead of crashing
    _write_turns(inp / "b4.parquet",
                 [("D", 0, "user", "more", None, ts(61))])
    q = ST.start_sessionizer(spark, str(inp), out, ckpt, gap_ms=gap)
    q.awaitTermination(120)
    closed = {r.conv_id: r for r in spark.read.parquet(out).collect()}
    assert "A" in closed and closed["A"].closed
    assert closed["A"].n_turns == 1  # the null-ts turn was dropped


def test_sessionize_batch_matches_streaming_sessionizer(spark, tmp_path):
    """Batch ≡ streaming on one fixture: the closed sessions the
    streaming operator emits must be exactly what ``sessionize_batch``
    computes for those conversations over the same rows (same gap).
    The batch operator is driver-oracle-gated, so this parity
    transitively hard-gates the streaming state semantics — including a
    conversation that closes and RE-OPENS (A gets two sessions).
    Watermark-advancing batches sit between A's sessions because the
    event-time timeout only fires at a trigger whose watermark passed
    last_ts+gap — replayed in event-time order (the contract both tiers
    share), the session splits are then identical."""
    from datetime import datetime, timezone

    from advanced_text_extraction_spark.operators.windows import \
        sessionize_batch

    def ts(mins):
        return datetime(2026, 1, 1, tzinfo=timezone.utc) \
            + pd.Timedelta(minutes=mins)

    gap = 5 * 60 * 1000
    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    batches = [
        [("A", 0, "user", "hello there", None, ts(0)),
         ("A", 1, "assistant", "hi!", None, ts(1)),
         ("B", 0, "user", "xxxx", None, ts(2)),
         ("B", 1, "assistant", None, None, ts(3))],  # null text counts 0
        # E advances the watermark past A's and B's gap -> both close
        [("E", 0, "user", "tick", None, ts(30))],
        # A re-opens: a second session for a closed conversation
        [("A", 2, "user", "round two", None, ts(60)),
         ("A", 3, "assistant", "yes", None, ts(62)),
         ("C", 0, "user", "zzz", None, ts(180))],
        # D pushes the watermark past everything still open
        [("D", 0, "user", "watermark push", None, ts(600))],
    ]
    for i, rows in enumerate(batches):
        _write_turns(inp / f"b{i}.parquet", rows)
        q = ST.start_sessionizer(spark, str(inp), out, ckpt, gap_ms=gap)
        q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    got = {(r.conv_id, r.first_ts): (r.n_turns, r.n_chars, r.last_ts)
           for r in streamed.collect()}
    # A closed twice (gap between ts(1) and ts(60)); B, C, E once each;
    # D is still open
    assert len(got) == 5 and all(r.closed for r in streamed.collect())
    assert sum(1 for k in got if k[0] == "A") == 2

    batch_df = spark.createDataFrame(
        pd.DataFrame([r for rows in batches for r in rows],
                     columns=["conv_id", "turn_idx", "role", "text",
                              "tool", "ts"]))
    closed_convs = {"A", "B", "C", "E"}
    want = {(r.conv_id, r.first_ts): (r.n_turns, r.n_chars, r.last_ts)
            for r in sessionize_batch(batch_df, "conv_id", "ts", "text",
                                      gap_ms=gap).collect()
            if r.conv_id in closed_convs}
    assert got == want
