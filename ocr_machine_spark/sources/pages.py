"""Pages-table source: distributed deterministic generation + lake I/O.

The generator is the scale-out form of the fixture factory — the analogue of
the reference's synthetic-scan factory (``fake_scan.py:287-349``) but executed
as a Spark job: ``spark.range(n)`` → ``mapInPandas`` building each page from
its row index alone (seeded per-row RNG, no sequential state), so generation
parallelises perfectly and any subset of rows is reproducible on any executor.

I/O: parquet by default. When an Iceberg catalog is configured on the session
(spark.sql.catalog.* — the runtime jar is not shipped in this container), the
same frames write through ``df.writeTo(table)`` unchanged; the lineage layer
(ocr_machine_spark.plans.lineage) is the parquet stand-in for Iceberg
snapshot-coupled commits.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_machine_spark.fixtures import make_page
from ocr_machine_spark.operators.extraction import PAGES_SCHEMA

GOLDEN_SCHEMA = (
    "url string, extracted_text string, "
    "spans array<struct<start:long,end:long,kind:string>>, "
    "removed_spans array<struct<start:long,end:long,reason:string>>"
)


def _page_rows(batches: Iterator[pd.DataFrame], seed: int, golden: bool) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for i in pdf["id"].tolist():
            p = make_page(int(i), seed)
            if golden:
                rows.append(
                    (
                        p.url,
                        p.extracted_text,
                        [{"start": s, "end": e, "kind": k} for s, e, k in p.spans],
                        [{"start": s, "end": e, "reason": k} for s, e, k in p.removed_spans],
                    )
                )
            else:
                rows.append(
                    (
                        p.url,
                        datetime.fromtimestamp(p.warc_ts, tz=timezone.utc).replace(tzinfo=None),
                        p.html,
                        p.text,
                        p.lang,
                    )
                )
        cols = (
            ["url", "extracted_text", "spans", "removed_spans"]
            if golden
            else ["url", "warc_ts", "html", "text", "lang"]
        )
        yield pd.DataFrame(rows, columns=cols)


def generate_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int = 32) -> DataFrame:
    """Distributed deterministic pages table: (url, warc_ts, html, text, lang)."""
    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(lambda it: _page_rows(it, seed, golden=False), schema=PAGES_SCHEMA)
    )


def generate_goldens(spark: SparkSession, n: int, seed: int = 42, partitions: int = 32) -> DataFrame:
    """Matching golden expectations, computed by construction (never via the
    extractor) — the committed-oracle role of the reference's
    ``outputs/cleaned_response_output.json`` + ``bounding_boxes.json``."""
    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(lambda it: _page_rows(it, seed, golden=True), schema=GOLDEN_SCHEMA)
    )


def write_pages(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
