"""Distributed exact global ranking — the scale-safe ntile.

``ntile(n) OVER (ORDER BY ...)`` with no PARTITION BY forces every row
through ONE task (Spark plans a SinglePartition exchange under the Window) —
the textbook driver-shaped bottleneck at 10^12 rows. This operator computes
the IDENTICAL assignment with no single-partition stage:

1. one pass sketches ``buckets-1`` approximate quantile cut points of the
   leading order column (tiny driver result — a model, not data);
2. rows map to a range bucket by pure comparisons (rows with equal leading
   values always share a bucket, so the within-bucket tiebreak sort is a
   complete total order);
3. one tiny count-per-bucket aggregation gives exact global offsets
   (``buckets`` rows to the driver);
4. a per-bucket window row_number plus the broadcast offset is the exact
   global 1-based index; tile boundaries are exact integer comparisons
   against driver-computed cumulative tile sizes — no division, no float.

Cost: 2 scans + one range-bucket shuffle (quantile-balanced). The
approximation in step 1 affects only load balance, never the answer.
Skew note: rows equal on the leading column are inseparable (exact global
rank requires their co-location); a corpus where one value dominates should
rank on a higher-cardinality composite leading column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_index(
    df: DataFrame, order_cols: list[str], *, buckets: int = 64
) -> tuple[DataFrame, int]:
    """→ (df + ``__gidx`` exact global 1-based row index under the total
    order ``order_cols``, total row count). No single-partition stage.

    Restriction (ADVICE r4 #4): the LEADING order column must be numeric and
    the order is ascending NULLS FIRST — ``percentile_approx`` (the range-
    bucket sketch of step 1) is numeric-only, and the bucket comparators
    assume asc. Descending ranking: negate the column first; string/date
    leading columns: rank on a numeric surrogate (epoch, dictionary code).
    Violations raise ValueError here, with this explanation, instead of an
    opaque AnalysisException inside the sketch."""
    lead = order_cols[0]
    from pyspark.sql.types import NumericType

    lead_field = next((f for f in df.schema.fields if f.name == lead), None)
    if lead_field is not None and not isinstance(lead_field.dataType, NumericType):
        raise ValueError(
            f"global_index: leading order column {lead!r} is "
            f"{lead_field.dataType.simpleString()}, but the quantile range-bucket "
            "sketch (percentile_approx) requires a NUMERIC leading column — "
            "rank on a numeric surrogate (epoch seconds, dictionary code) or "
            "negate for descending order"
        )
    qs = [i / buckets for i in range(1, buckets)]
    cuts = (
        df.select(F.percentile_approx(lead, F.lit(qs), F.lit(10000)).alias("c"))
        .collect()[0]["c"]
        or []
    )
    pid: Column = F.lit(0)
    seen = set()
    for c in cuts:  # dedupe equal cut points (heavy-hitter values)
        if c in seen:
            continue
        seen.add(c)
        pid = pid + F.when(F.col(lead) > F.lit(c), 1).otherwise(0)
    with_pid = df.withColumn("__pid", pid)
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if not offsets:
        return with_pid.withColumn("__gidx", F.lit(1).cast("long")).drop("__pid"), 0
    omap = F.create_map(*[x for p, o in offsets.items() for x in (F.lit(p), F.lit(o))])
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    gidx = (omap[F.col("__pid")] + F.row_number().over(w)).cast("long")
    return with_pid.withColumn("__gidx", gidx).drop("__pid"), total


def ntile_global(
    df: DataFrame, n: int, order_cols: list[str], *, buckets: int = 64
) -> DataFrame:
    """df + ``band`` column ≡ ``ntile(n) OVER (ORDER BY order_cols)`` —
    byte-identical to the SQL window function, computed distributed."""
    idx, total = global_index(df, order_cols, buckets=buckets)
    q, r = divmod(total, n)
    sizes = [(q + 1 if k < r else q) for k in range(n)]
    bounds = []
    acc = 0
    for s in sizes[:-1]:
        acc += s
        bounds.append(acc)
    band: Column = F.lit(1)
    for b in bounds:
        band = band + F.when(F.col("__gidx") > F.lit(b), 1).otherwise(0)
    return idx.withColumn("band", band.cast("long")).drop("__gidx")
