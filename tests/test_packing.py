"""Unit tests for the corpus-shaping operators (operators/packing.py):
global duplicate-span removal and two-phase prefix-sum packing.

The catalog-level DuckDB parity for q61/q62 lives in
test_oracle_parity.py; these tests pin the operator contracts that the
oracle comparison can't see directly (keeper choice, partition-count
independence of the distributed scan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from las_vpe_platform_spark.operators.packing import dedup_spans, pack_sequences


@pytest.fixture(scope="module")
def spark():
    from las_vpe_platform_spark.session import get_spark

    return get_spark("test-packing")


def test_dedup_spans_first_occurrence_wins(spark):
    # doc 1 and doc 7 share an identical 4-token span; doc 1 is the
    # lower id so it keeps the span, doc 7 loses those tokens
    rows = [
        (1, "a b c d e f g h"),          # spans: "a b c d", "e f g h"
        (7, "a b c d x y"),              # spans: "a b c d" (dup), "x y"
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup_spans(df, "doc_id", "text", span_tokens=4).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["tokens_kept"] == 8
    assert out[7]["n_spans"] == 2 and out[7]["n_kept"] == 1
    assert out[7]["tokens_kept"] == 2  # only the short tail "x y"


def test_dedup_spans_within_doc_repeat_dropped(spark):
    df = spark.createDataFrame(
        [(5, "p q p q")], "doc_id long, text string"
    )
    (row,) = dedup_spans(df, "doc_id", "text", span_tokens=2).collect()
    assert row["n_spans"] == 2 and row["n_kept"] == 1
    assert row["tokens_kept"] == 2


def test_pack_sequences_prefix_is_exclusive_total(spark):
    df = spark.createDataFrame(
        [(i, 10 + i) for i in range(40)], "doc_id long, n long"
    )
    packed = pack_sequences(df, "doc_id", "n").collect()
    rows = sorted(packed, key=lambda r: (r["_ord"], r["doc_id"]))
    running = 0
    for r in rows:
        assert r["prefix"] == running
        running += r["n"]
    assert running == sum(10 + i for i in range(40))


def test_pack_sequences_independent_of_input_partitioning(spark):
    df = spark.createDataFrame(
        [(i, 1 + (i * 7) % 13) for i in range(100)], "doc_id long, n long"
    )
    a = {r["doc_id"]: r["prefix"] for r in pack_sequences(df, "doc_id", "n").collect()}
    b = {
        r["doc_id"]: r["prefix"]
        for r in pack_sequences(df.repartition(17), "doc_id", "n").collect()
    }
    c = {
        r["doc_id"]: r["prefix"]
        for r in pack_sequences(df.coalesce(1), "doc_id", "n").collect()
    }
    assert a == b == c


def test_pack_sequences_drops_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 3)], "doc_id long, n long"
    )
    ids = {r["doc_id"] for r in pack_sequences(df, "doc_id", "n").collect()}
    assert ids == {1, 3}
