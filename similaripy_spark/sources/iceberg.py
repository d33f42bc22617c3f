"""Iceberg-backed ``pages`` source (north-rule input: an Iceberg table of
Common-Crawl-style web pages) with a parquet fallback for runtimes without
the Iceberg Spark extension.

The engine's dataflow is source-agnostic — ``IndexBuilder.build`` takes any
DataFrame with the pages schema — so Iceberg support is exactly this
boundary: locate the table, optionally pin a snapshot (reproducible builds
re-read the same table state on resume), validate the schema contract
(BASELINE.json input_hint: url string, warc_ts timestamp, html binary,
text string, lang string).

This container ships no Iceberg runtime jar, so the Iceberg branch is
import-gated and raises ``IcebergUnavailableError`` naming the exact
packages needed; the parquet branch exercises the same schema contract and
snapshot-pinning interface shape. On a real cluster:

    spark-submit --py-files dist/similaripy_spark.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
      --conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.cc.type=rest \\
      tools/index_job.py build --pages iceberg:cc.crawl.pages ...

Predicate pushdown / column pruning / partition pruning flow through
unchanged in both branches — Catalyst pushes the ``lang`` filter and the
(doc_id, text) projection into the Iceberg scan exactly as into the parquet
scan (the build reads 2 of 6 columns; TESTDATA-scale plans are pinned in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: input_hint contract: name -> required Spark type
PAGES_CONTRACT = {
    "url": T.StringType(),
    "warc_ts": T.TimestampType(),
    "html": T.BinaryType(),
    "text": T.StringType(),
    "lang": T.StringType(),
}

ICEBERG_PREFIX = "iceberg:"


class IcebergUnavailableError(RuntimeError):
    pass


class PagesSchemaError(ValueError):
    pass


def validate_pages_schema(df: DataFrame) -> DataFrame:
    """Enforce the input_hint contract. Extra columns are allowed (Iceberg
    tables evolve); missing or mistyped required columns fail fast with the
    full delta, not at executor time inside a pandas UDF."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for name, want in PAGES_CONTRACT.items():
        if name not in actual:
            problems.append(f"missing column {name}: {want.simpleString()}")
        elif actual[name] != want:
            problems.append(
                f"column {name}: expected {want.simpleString()}, "
                f"got {actual[name].simpleString()}"
            )
    if problems:
        raise PagesSchemaError(
            "pages table violates the input contract: " + "; ".join(problems)
        )
    return df


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_pages_table(
    spark: SparkSession,
    source: str,
    *,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> DataFrame:
    """Load the pages table from ``iceberg:<catalog.db.table>`` or a parquet
    path, schema-validated either way.

    ``snapshot_id`` / ``as_of_timestamp_ms`` pin the Iceberg snapshot so a
    resumed build re-reads the exact table state of the first attempt
    (content drift between attempts would silently mix corpora across
    commit units — lineage records the snapshot for this reason).
    """
    if source.startswith(ICEBERG_PREFIX):
        table = source[len(ICEBERG_PREFIX):]
        if not _iceberg_available(spark):
            raise IcebergUnavailableError(
                f"reading {source!r} needs the Iceberg Spark runtime on the "
                "classpath (org.apache.iceberg:iceberg-spark-runtime) and a "
                "configured spark.sql.catalog.<name>; this runtime has "
                "neither. Point `source` at a parquet path for the "
                "jar-free path."
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
        return validate_pages_schema(reader.load(table))
    if snapshot_id is not None or as_of_timestamp_ms is not None:
        raise ValueError(
            "snapshot pinning is an Iceberg feature; the parquet fallback "
            "has no snapshot log (write immutable paths instead)"
        )
    return validate_pages_schema(spark.read.parquet(source))
