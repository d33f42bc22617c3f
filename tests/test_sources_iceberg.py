"""Pages-source boundary: schema contract, Iceberg gating, parquet path."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from similaripy_spark.sources.iceberg import (
    IcebergUnavailableError,
    PagesSchemaError,
    read_pages_table,
    validate_pages_schema,
)
from similaripy_spark.sources.pages import generate_pages


def test_parquet_source_roundtrip(spark, tmp_path):
    p = str(tmp_path / "pages")
    generate_pages(spark, 200, vocab_size=300).write.parquet(p)
    df = read_pages_table(spark, p)
    assert df.count() == 200
    # extra columns (evolved table) are allowed
    generate_pages(spark, 50, vocab_size=300).withColumn(
        "fetch_status", F.lit(200)
    ).write.mode("overwrite").parquet(p)
    assert read_pages_table(spark, p).count() == 50


def test_schema_contract_rejects_drift(spark):
    bad = spark.createDataFrame(
        [("u", "t")], "url string, text string"
    )
    with pytest.raises(PagesSchemaError, match="missing column warc_ts"):
        validate_pages_schema(bad)
    mistyped = generate_pages(spark, 5, vocab_size=50).withColumn(
        "html", F.col("text")  # string where binary is required
    )
    with pytest.raises(PagesSchemaError, match="column html: expected binary"):
        validate_pages_schema(mistyped)


def test_iceberg_gated_with_actionable_error(spark):
    with pytest.raises(IcebergUnavailableError, match="iceberg-spark-runtime"):
        read_pages_table(spark, "iceberg:cc.crawl.pages")


def test_snapshot_pinning_is_iceberg_only(spark, tmp_path):
    p = str(tmp_path / "pages2")
    generate_pages(spark, 10, vocab_size=50).write.parquet(p)
    with pytest.raises(ValueError, match="snapshot pinning"):
        read_pages_table(spark, p, snapshot_id=123)
