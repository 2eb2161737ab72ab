"""Bloom-filter semi-join contract tests (operators/bloom.py).

The q63 catalog entry pins Spark==DuckDB on the full stats (including
exact false-positive counts); these tests pin the operator laws the
oracle can't isolate: zero false negatives, and a probe plan that
never shuffles the fact side.
"""

from __future__ import annotations

from conftest import outside_cached_plans

import pyspark.sql.functions as F
import pytest

from las_vpe_platform_spark.operators.bloom import bloom_build, bloom_probe


@pytest.fixture(scope="module")
def spark():
    from las_vpe_platform_spark.session import get_spark

    return get_spark("test-bloom")


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 200).select(F.col("id").alias("k"))
    probes = spark.range(0, 2000).select(F.col("id").alias("k"))
    blocks = bloom_build(members, "k", m=4096, k=4)
    flags = {
        r["k"]: r["bloom_pass"]
        for r in bloom_probe(probes, "k", blocks, m=4096, k=4).collect()
    }
    assert all(flags[i] for i in range(200))  # every member passes
    fp = sum(1 for i in range(200, 2000) if flags[i])
    # 800 bits set of 4096 -> per-hash hit ~0.2, 4 hashes ~0.2^4;
    # generous ceiling only guards against a broken hash family
    assert fp < 180



def test_bloom_probe_does_not_shuffle_fact(spark):
    members = spark.range(0, 50).select(F.col("id").alias("k"))
    fact = spark.range(0, 10_000).select(F.col("id").alias("k"))
    blocks = bloom_build(members, "k", m=1024, k=4)
    probed = bloom_probe(fact, "k", blocks, m=1024, k=4)
    plan = outside_cached_plans(
        probed._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the probe itself adds no hash/range exchange on the fact lineage
    # (the only exchanges in the full q63 plan belong to the staged
    # build aggregate — excluded above — and the final stats groupBy)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_bloom_build_block_count_bounded(spark):
    members = spark.range(0, 10_000).select(F.col("id").alias("k"))
    blocks = bloom_build(members, "k", m=1024, k=4).collect()
    assert len(blocks) <= (1024 // 63) + 1
    assert all(r["mask"] > 0 for r in blocks)  # 63-bit masks stay positive
