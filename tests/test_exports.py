"""Export sinks (SURVEY §2.6 K2/K3/K4/K5/K6): format contracts from the
reference (/root/reference/text_extractor.py:1139-1203, cli.py:210-231)
verified on real extraction output."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from advanced_text_extraction_spark.operators import exports as X
from advanced_text_extraction_spark.operators.extract import extract


@pytest.fixture(scope="module")
def extracted_df(spark, transcripts_path):
    df = extract(spark.read.parquet(transcripts_path).repartition(8))
    return df.cache()


def test_export_json_records_and_manifest(extracted_df, tmp_path, spark):
    path = str(tmp_path / "json")
    X.export_json(extracted_df, path)
    back = spark.read.json(path)
    assert back.count() == extracted_df.count()
    assert set(X.EXPORT_COLS) <= set(back.columns)
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["total_records"] == extracted_df.count()
    assert manifest["format"] == "json-lines"


def test_export_csv_flattens_newlines(extracted_df, tmp_path, spark):
    path = str(tmp_path / "csv")
    X.export_csv(extracted_df, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == extracted_df.count()
    # reference contract text_extractor.py:1179 — no newlines survive
    assert back.filter(F.col("extracted_text").contains("\n")).count() == 0


def test_export_txt_banner_format(extracted_df, tmp_path):
    path = str(tmp_path / "txt")
    X.export_txt(extracted_df.limit(5), path, partitions=1)
    files = glob.glob(os.path.join(path, "part-*"))
    body = "".join(open(f).read() for f in files)
    assert "=" * 80 in body
    assert "conv: " in body and "confidence: " in body


def test_export_per_conversation_partitions(extracted_df, tmp_path):
    path = str(tmp_path / "per_conv")
    X.export_per_conversation(extracted_df, path, fmt="json")
    dirs = [d for d in os.listdir(path) if d.startswith("conv_id=")]
    n_convs = extracted_df.select("conv_id").distinct().count()
    assert len(dirs) == n_convs


def test_export_combined_single_file(extracted_df, tmp_path, spark):
    path = str(tmp_path / "combined")
    X.export_combined(extracted_df, path, fmt="csv")
    parts = glob.glob(os.path.join(path, "part-*.csv"))
    assert len(parts) == 1
    back = spark.read.option("header", True).csv(path)
    assert back.count() == extracted_df.count()
