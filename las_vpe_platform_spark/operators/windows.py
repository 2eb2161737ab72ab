"""Window / top-k operators (SURVEY §2.6 W1-W3).

W1 — ranked similar-neighbor lists (Neo4jConnector.java:770-776 does
Cypher ORDER BY similarity DESC per query node) — and W2's IDRANK
output are per-group top-k: window rank + filter, which Spark executes
with a partial top-k sort per partition (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (W1/W2).

    Deterministic: ties broken by ``tiebreak_cols`` so results are
    stable across partitionings (required for oracle comparison and
    for reproducible reruns at any cluster size).
    """
    order = [F.asc(order_col) if ascending else F.desc(order_col)]
    for c in tiebreak_cols or []:
        order.append(F.asc(c))
    w = W.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def last_n(df: DataFrame, order_col: str, n: int, tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Globally most-recent n rows (W3 — the TERM_SIG last-100 ring
    buffer, TaskController.java:64-80).

    orderBy(desc).limit(n) — Spark runs TakeOrderedAndProject: each
    partition keeps its local top-n, the driver merges n*p rows; no
    global sort even at 100 TB.
    """
    order = [F.desc(order_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    return df.orderBy(*order).limit(n)


def global_topk_ranked(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k with a ``rank`` column, scale-shaped: the k rows are
    selected FIRST via orderBy+limit (TakeOrderedAndProject — per-
    partition heaps, never a single-partition window over the full
    input), then ranked by a window that only ever sees k rows.

    ``order_cols`` are Column expressions including sort direction
    (e.g. ``[F.desc("cnt"), F.asc("key")]``); ties must be fully broken
    for the rank to be deterministic. Shared by q88/q95-style
    diagnostics — keep the idiom here so the two stay in sync.
    """
    w = W.orderBy(*order_cols)
    return (
        df.orderBy(*order_cols)
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w))
    )
