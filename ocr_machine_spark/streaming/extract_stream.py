"""Streaming surface: the batch extract UDF lifted into Structured Streaming.

The reference is batch-only (its "streaming inference" at
``training_strikethrough/README.md:16`` means synchronous per-image calls,
not event streams — SURVEY.md §1.6), so streaming is an *extension*: the SAME
``mapInArrow`` extraction stage runs unchanged under ``readStream``
(SURVEY.md §7 "hard parts" notes the lift), which is the point — one
extraction core, two execution modes.

At scale this is the continuous-ingest story: new WARC drops land as files /
Kafka messages; watermarked windows bound state for late pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_machine_spark.operators.extraction import PAGES_SCHEMA, extract_pages


def extract_pages_stream(
    spark: SparkSession, input_path: str, *, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream of pages parquet → streaming extraction frame.

    The returned frame is unbounded; sink it with ``writeStream`` (parquet +
    checkpointLocation in production; memory sink in tests)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    return extract_pages(stream)


HOST_STATE_SCHEMA = "n_pages long, bytes_html long"
HOST_OUT_SCHEMA = "host string, n_pages long, bytes_html long"


def host_crawl_totals_stream(
    spark: SparkSession, input_path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    running per-host crawl totals across triggers — the continuous-ingest
    bookkeeping a 10^12-page crawl needs (which hosts are hot, how many bytes
    they shipped so far). State per host is two longs; each trigger folds its
    Arrow batches into the state and emits the updated row (output mode
    ``update``). Deterministic: totals depend only on the set of files
    processed, never on trigger boundaries."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    hosts = stream.select(
        # no trailing-slash requirement: path-less urls ("https://a.com")
        # are common in real WARC data and must keep their host, not lump
        # into a bogus '' group (twin regex matches — oracle parity)
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.length("html").alias("nb"),
    )

    def update(key: tuple, pdfs, state: GroupState):
        n = 0
        b = 0
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf["nb"].sum())
        if state.exists:
            pn, pb = state.get
            n += pn
            b += pb
        state.update((n, b))
        yield pd.DataFrame({"host": [key[0]], "n_pages": [n], "bytes_html": [b]})

    return hosts.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=HOST_OUT_SCHEMA,
        stateStructType=HOST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_page_counts(
    spark: SparkSession, input_path: str, *, window: str = "1 hour", late: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window ingest metrics. Late-row DROPPING is a
    function of watermark advancement, which depends on how files batch into
    triggers — NOT deterministic across runs; only the no-late-data case
    (or complete mode, which keeps all windows) is replay-stable. The gated
    ``streaming_window_events`` query therefore runs in complete mode."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_path)
    return (
        stream.withWatermark("warc_ts", late)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("html")).alias("bytes_html"))
    )


DEDUP_STATE_SCHEMA = "keeper long, n long"
DEDUP_OUT_SCHEMA = "fp string, keeper_doc_id long, n_copies long"
DOCS_STREAM_SCHEMA = "doc_id long, text string"


def dedup_docs_stream(
    spark: SparkSession, input_path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stateful streaming EXACT-DEDUP (``applyInPandasWithState``): the
    continuous-ingest form of ``operators.dedup.dedup_exact`` — as document
    drops arrive, each content fingerprint's state tracks the surviving
    (keeper) document and its copy count, so downstream consumers always see
    the current dedup decision without re-scanning the corpus.

    Keyed by ``md5(norm_text(text))``; state per fingerprint is two longs
    (keeper doc_id, copies). The keeper is the MINIMUM doc_id observed so
    far — a fold that is associative/commutative over rows, so the final
    state depends only on the SET of files processed, never on trigger
    boundaries (same replay-stability contract as
    ``host_crawl_totals_stream``; pinned by a two-drop test). Output mode
    ``update``: each trigger emits the fingerprints it touched."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ocr_machine_spark.functions import norm_text

    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    keyed = stream.select(
        F.md5(norm_text(F.coalesce(F.col("text"), F.lit("")))).alias("fp"), "doc_id"
    )

    def update(key: tuple, pdfs, state: GroupState):
        keeper = None
        n = 0
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                keeper = m if keeper is None else min(keeper, m)
                n += len(pdf)
        if state.exists:
            pk, pn = state.get
            keeper = pk if keeper is None else min(keeper, pk)
            n += pn
        state.update((keeper, n))
        yield pd.DataFrame(
            {"fp": [key[0]], "keeper_doc_id": [keeper], "n_copies": [n]}
        )

    return keyed.groupBy("fp").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
