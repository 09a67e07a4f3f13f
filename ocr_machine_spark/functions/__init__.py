"""Column-expression helpers — JVM-side only (whole-stage-codegen friendly).

Everything here compiles to built-in Catalyst expressions; no Python UDFs.
These are the engine's "scalar function" surface, the declarative counterpart
of the reference's per-row helper functions (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column | str) -> Column:
    """Canonical text normalization: lowercase + collapse whitespace + trim.
    The engine-wide normalization policy (SURVEY.md §7 determinism)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def token_count(col: Column | str) -> Column:
    # long, not int: result-type parity with DuckDB len() (BIGINT) so the
    # driver's typed value hash matches. Empty text has ZERO tokens —
    # split('') yields [''], a phantom token that would otherwise leak into
    # every ratio (the SQL twins carry the same CASE guard).
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "", F.lit(0)).otherwise(F.size(F.split(c, " "))).cast("long")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-grams as an array<string> — pure JVM expressions, the shingle
    stage of MinHash/Jaccard/winnowing dedup.

    Built by zipping k−1 shifted copies of the token array (each ``slice``
    sits OUTSIDE the lambda), not by slicing inside a window ``transform``:
    an expression subtree referenced inside a higher-order-function lambda is
    re-evaluated per invocation (no CSE across HOF boundaries — the round-4
    winnowing lesson), so the old ``slice(split(...), i, k)``-in-lambda form
    re-split the text once per window = O(words²) character work per row.
    This form is O(k·words). ``zip_with`` pads the shorter side with NULL and
    ``concat`` propagates it, so over-the-end windows become NULL and the
    final ``slice`` drops them; output is element-identical to the old form
    (pinned by tests)."""
    c = F.col(col) if isinstance(col, str) else col
    ws = F.split(c, " ")
    cur = ws
    for j in range(1, k):
        tail = F.slice(ws, j + 1, F.greatest(F.size(ws) - j, F.lit(0)))
        cur = F.zip_with(cur, tail, lambda a, b: F.concat(a, F.lit(" "), b))
    # guard: docs with fewer than k words have no shingles (slice len ≤ 0
    # would throw; the empty array is the spec on both engines)
    return F.when(
        F.size(ws) >= k, F.slice(cur, 1, F.size(ws) - (k - 1))
    ).otherwise(F.array().cast("array<string>"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns via zip_with + aggregate —
    sequential left-to-right summation (deterministic, matches DuckDB's
    list_dot_product order for oracle parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dlit(x: float) -> str:
    """Exact SQL double literal: repr round-trips the IEEE value, the D
    suffix keeps Spark from parsing it as DECIMAL."""
    return f"{float(x)!r}D"


def dot_unrolled_sql(a: str, b: str, dim: int) -> str:
    """``dot`` unrolled to ``0.0 + a[1]*b[1] + a[2]*b[2] + …`` for a KNOWN
    dim, as ONE SQL expression string: whole-stage codegen compiles it (the
    ``aggregate`` lambda stays interpreted — measured 10-30× slower per
    element), and one ``F.expr`` parse costs one py4j round-trip where
    building the tree Column-by-Column costs ~3·dim round-trips PER DOT
    (measured ~1.2s of driver time per query at dim=64). SQL ``+`` is
    left-associative, so the operation sequence — and therefore every IEEE
    bit — is identical to ``dot``. ``a``/``b`` are SQL expressions yielding
    array<double>; keep ``dot`` for dim-agnostic call sites."""
    terms = " + ".join(f"element_at({a}, {i}) * element_at({b}, {i})" for i in range(1, dim + 1))
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def dot_literal_sql(a: str, weights: list[float]) -> str:
    """``dot_literal`` as one SQL expression string (see ``dot_unrolled_sql``)."""
    terms = " + ".join(
        f"element_at({a}, {i}) * {_dlit(w)}" for i, w in enumerate(weights, start=1)
    )
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def fixed_point(col: Column, scale: int = 10_000) -> Column:
    """floor(x*scale + 0.5) as bigint — cross-engine-stable rounding for value
    hashing (identical IEEE ops on both sides, no round-rule ambiguity)."""
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("long")
