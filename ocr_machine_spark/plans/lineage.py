"""Lineage-coupled, idempotently-resumable extraction runs (north_rule).

The reference checkpoints every milestone as timestamped JSON files so a crashed
run can be hand-resumed (``python_files/textract_agent.py:228-237``,
requirement at ``python_files/main.py:25-27``). Here the same guarantee is
structural:

* the input is split into deterministic **buckets** — ``pmod(xxhash64(url),
  n_buckets)`` — so bucket membership never depends on run order or cluster
  size;
* each run processes only buckets absent from the **lineage table**
  (an anti-join on committed partition ids);
* per bucket, data files are written first (dynamic partition overwrite, so a
  re-run of a crashed bucket replaces its orphans), then the bucket's lineage
  row is appended — the lineage row IS the commit marker;
* readers go through ``read_extractions``, which inner-joins data partitions
  against committed lineage, so half-written buckets are invisible.

With an Iceberg catalog this maps 1:1 onto write-audit-publish: data + lineage
append in one snapshot transaction; the parquet layout here is the sandbox
stand-in. Lineage schema follows FIXTURES.md §4; stats are aggregated from the
files actually on disk, so the bench numbers are auditable against lineage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_machine_spark.operators.extraction import extract_pages, with_bucket

LINEAGE_DIR = "_lineage"
DATA_DIR = "data"


def _lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, LINEAGE_DIR)


def _data_path(out_dir: str) -> str:
    return os.path.join(out_dir, DATA_DIR)


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog on this session, else None.

    Iceberg registers as ``spark.sql.catalog.<name> =
    org.apache.iceberg.spark.SparkCatalog`` — presence of such a key is the
    capability check (the runtime jar is not shipped in this sandbox, so the
    branch is exercised for dispatch only)."""
    for r in spark.sql("SET").collect():
        k = r["key"]
        if (
            k.startswith("spark.sql.catalog.")
            and k.count(".") == 3
            and "iceberg" in str(r["value"]).lower()
        ):
            return k.rsplit(".", 1)[1]
    return None


def choose_sink(spark: SparkSession, table: str | None) -> str:
    """'iceberg' when a table identifier is given AND an Iceberg catalog is
    configured; 'parquet' otherwise (sandbox stand-in)."""
    return "iceberg" if table is not None and iceberg_catalog(spark) is not None else "parquet"


def write_bucketed(df: DataFrame, spark: SparkSession, *, path: str, table: str | None = None) -> str:
    """Write bucket-partitioned extraction data through the chosen sink and
    return which sink was used.

    Iceberg path: ``writeTo(table).overwritePartitions()`` — an atomic
    snapshot commit that replaces exactly the buckets present in ``df``
    (write-audit-publish; crashed-bucket re-runs replace their orphans).
    Parquet path: dynamic partition overwrite — the same replace-by-bucket
    semantics, minus the snapshot atomicity, which the lineage commit marker
    restores at read time."""
    sink = choose_sink(spark, table)
    if sink == "iceberg":
        df.writeTo(table).overwritePartitions()
    else:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(path)
        )
    return sink


def committed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    try:
        rows = spark.read.parquet(_lineage_path(out_dir)).select("partition_id").distinct().collect()
    except Exception:  # no lineage yet → fresh run
        return []
    return sorted(r[0] for r in rows)


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    run_id: str,
    n_buckets: int = 16,
    partitions: int | None = None,
    input_split: str = "",
    max_buckets_this_run: int | None = None,
    table: str | None = None,
) -> dict:
    """Extract all not-yet-committed buckets of ``pages`` into ``out_dir``.

    ``max_buckets_this_run`` exists for failure-injection tests (process only
    k buckets, "crash", resume). Returns run stats.
    """
    done = committed_buckets(spark, out_dir)
    bucketed = with_bucket(pages, n_buckets)
    todo = bucketed.filter(~F.col("bucket").isin(done)) if done else bucketed

    selected: list[int] | None = None
    if max_buckets_this_run is not None:
        remaining = sorted(set(range(n_buckets)) - set(done))
        selected = remaining[:max_buckets_this_run]
        todo = todo.filter(F.col("bucket").isin(selected))

    extracted = extract_pages(todo, partitions=partitions)
    out = with_bucket(extracted, n_buckets)  # same deterministic bucket fn

    # 1) data first — bucket-replacing write (Iceberg snapshot commit when a
    # catalog is configured; parquet dynamic overwrite otherwise), so a
    # re-run of a crashed bucket replaces its orphans
    write_bucketed(out, spark, path=_data_path(out_dir), table=table)

    # 2) lineage from what's actually on disk (auditable), committed last
    written = spark.read.parquet(_data_path(out_dir))
    if done:
        written = written.filter(~F.col("bucket").isin(done))
    if selected is not None:
        written = written.filter(F.col("bucket").isin(selected))
    lineage = written.groupBy("bucket").agg(
        F.lit(run_id).alias("run_id"),
        F.count("*").alias("rows_in"),
        F.count("*").alias("rows_out"),
        F.sum(F.col("ok").cast("long")).alias("pages_ok"),
        F.sum((~F.col("ok")).cast("long")).alias("pages_failed"),
        F.sum("bytes_html").alias("bytes_html"),
        F.sum("chars_out").alias("chars_extracted"),
        F.lit(input_split).alias("input_split"),
    ).withColumnRenamed("bucket", "partition_id")
    lineage.write.mode("append").parquet(_lineage_path(out_dir))

    stats = lineage.agg(
        F.count("*").alias("buckets"),
        F.sum("rows_in").alias("rows"),
        F.sum("pages_ok").alias("ok"),
        F.sum("pages_failed").alias("failed"),
        F.sum("bytes_html").alias("bytes_html"),
    ).collect()[0]
    return {
        "run_id": run_id,
        "buckets_committed": stats["buckets"],
        "rows": stats["rows"] or 0,
        "pages_ok": stats["ok"] or 0,
        "pages_failed": stats["failed"] or 0,
        "bytes_html": stats["bytes_html"] or 0,
    }


def read_extractions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed rows only: data ⋉ lineage on partition id (semi-join keeps
    half-written buckets invisible, exactly-once semantics for readers)."""
    data = spark.read.parquet(_data_path(out_dir))
    lin = spark.read.parquet(_lineage_path(out_dir)).select(F.col("partition_id").alias("bucket")).distinct()
    return data.join(F.broadcast(lin), "bucket", "left_semi")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_lineage_path(out_dir))
