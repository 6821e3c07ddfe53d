"""Golden end-to-end gate (SURVEY §5.2 layer 2, the north-rule correctness
criterion): run the Spark job on the seeded fixture set, join to the
single-node oracle's goldens on (conv_id, turn_idx), and assert per-turn
extracted-text byte-equality under stable turn ordering, span validity,
and metadata parity."""

from __future__ import annotations

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

from advanced_text_extraction_spark.plans.pipeline import run_extract_job
from advanced_text_extraction_spark.sources import catalog


@pytest.fixture(scope="module")
def extracted(spark, transcripts_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh"))
    df = spark.read.parquet(transcripts_path)
    stats = run_extract_job(spark, df, root, n_buckets=8, salt=2)
    assert stats.input_rows > 0
    out = catalog.read_extracted(spark, root).toPandas()
    return root, out


def test_row_coverage(extracted, golden_pdf):
    _, out = extracted
    assert len(out) == len(golden_pdf)
    got = set(zip(out.conv_id, out.turn_idx))
    want = set(zip(golden_pdf.conv_id, golden_pdf.turn_idx))
    assert got == want


def test_per_turn_text_equality(extracted, golden_pdf):
    """100% per-turn extracted-text equality (BASELINE.md target)."""
    _, out = extracted
    merged = out.merge(
        golden_pdf, on=["conv_id", "turn_idx"], suffixes=("", "_g"),
        validate="one_to_one",
    )
    bad = merged[merged.extracted_text != merged.extracted_text_g]
    assert bad.empty, (
        f"{len(bad)}/{len(merged)} turns mismatch; first: "
        f"{bad.iloc[0][['conv_id', 'turn_idx']].to_dict()}\n"
        f"engine={bad.iloc[0].extracted_text[:300]!r}\n"
        f"oracle={bad.iloc[0].extracted_text_g[:300]!r}"
    )
    for col in ("content_type", "confidence", "language", "status"):
        assert (merged[col] == merged[f"{col}_g"]).all(), f"{col} mismatch"


def test_spans_match_and_reconstruct(extracted, golden_pdf):
    _, out = extracted
    merged = out.merge(golden_pdf, on=["conv_id", "turn_idx"],
                       suffixes=("", "_g"), validate="one_to_one")
    for row in merged.itertuples(index=False):
        engine_spans = [
            (s["block_idx"], s["start"], s["end"], s["src_start"], s["src_end"])
            for s in row.spans
        ]
        assert engine_spans == list(map(tuple, row.spans_g)), (row.conv_id, row.turn_idx)
        # spans reconstruct the extracted text in order, non-overlapping
        prev_end = -1
        for b, s, e, ss, se in engine_spans:
            assert 0 <= s <= e <= len(row.extracted_text)
            assert s > prev_end
            prev_end = e
            assert row.extracted_text[s:e] != "" or s == e
            if row.content_type in ("pdf", "docx", "excel", "powerpoint",
                                    "office"):
                assert ss == se == -1  # binary source: no char offsets
            else:
                assert 0 <= ss <= se <= int(row.metadata["raw_len"])


def test_stable_order_within_files(extracted):
    """W3: every written file is sorted by (conv_id, turn_idx) — the
    stable-turn-ordering contract holds at the storage layer."""
    root, _ = extracted
    files = glob.glob(f"{root}/extracted/**/*.parquet", recursive=True)
    assert files
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx"]).to_pandas()
        key = list(zip(t.conv_id, t.turn_idx))
        assert key == sorted(key), f"unsorted file {f}"


def test_dedup_applied(extracted, transcripts_pdf):
    """U1: duplicate (conv_id, turn_idx) fixture rows collapse to one."""
    _, out = extracted
    assert len(transcripts_pdf) > len(
        transcripts_pdf.drop_duplicates(["conv_id", "turn_idx"])
    )
    assert not out.duplicated(["conv_id", "turn_idx"]).any()


def test_error_rows_survive(extracted):
    """Failure-as-data: broken base64 PDF → status='error', job completes
    (reference failure-list analog text_extractor.py:987-989)."""
    _, out = extracted
    errs = out[out.status == "error"]
    assert len(errs) >= 1
    assert (errs.extracted_text == "").all()
    assert (errs.error != "").all()


def test_edge_rows(extracted):
    _, out = extracted
    by_key = out.set_index(["conv_id", "turn_idx"])
    # FIXTURES.md §3: conv-1 tail rows — empty, ws-only, all-boilerplate
    # html, broken pdf, short pdf, broken office zip, non-OOXML zip
    tail = out[out.conv_id == "conv-1"].sort_values("turn_idx").tail(8)
    texts = list(tail.extracted_text)
    assert texts[0] == "" and texts[1] == ""  # empty + whitespace-only
    assert texts[2] == ""                     # all-boilerplate html
    assert tail.iloc[2].content_type == "html"
    assert (tail.iloc[0].language == "unknown")
    assert tail.iloc[6].content_type == "office"      # broken base64 zip
    assert tail.iloc[6].status == "error"
    assert tail.iloc[7].content_type == "office"      # zip but not OOXML
    assert tail.iloc[7].status == "error"
