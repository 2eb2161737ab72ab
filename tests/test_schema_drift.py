"""Cross-engine schema guard for the driver-generated testdata.

The driver regenerates /root/testdata every round and the physical
parquet encoding CAN change (round 2: events.ts went TIMESTAMP(NANOS)
-> timestamp[us]). Every catalog query reads through
sources.tables.load_table and compares against DuckDB reading the
same files, so a silent engine-mapping divergence (Spark and DuckDB
decoding the same column to different logical types/values) breaks
parity in confusing ways mid-suite. This test fails FIRST and names
the table/column, so a regeneration surprise costs minutes, not
hours.
"""

from __future__ import annotations

import duckdb
import pytest

from las_vpe_platform_spark.sources.tables import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Spark logical type -> the DuckDB types it may legitimately decode
# the same parquet column to
_COMPAT = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    # load_table normalizes whatever timestamp encoding the driver
    # produced to NTZ; DuckDB's TIMESTAMP is naive micros
    "timestamp_ntz": {"TIMESTAMP"},
    "array<float>": {"FLOAT[]"},
    "array<double>": {"DOUBLE[]"},
    "decimal(15,2)": {"DECIMAL(15,2)"},
}


@pytest.mark.parametrize("table", TABLES)
def test_table_schema_agrees_across_engines(spark, sf_dir, table):
    sdf = load_table(spark, sf_dir, table)
    con = duckdb.connect()
    desc = con.execute(
        f"DESCRIBE SELECT * FROM '{sf_dir}/{table}.parquet'"
    ).fetchall()
    duck_types = {row[0]: row[1] for row in desc}

    assert [f.name for f in sdf.schema.fields] == list(duck_types), (
        f"{table}: column set/order diverged: "
        f"spark={[f.name for f in sdf.schema.fields]} duckdb={list(duck_types)}"
    )
    for f in sdf.schema.fields:
        stype = f.dataType.simpleString()
        dtype = duck_types[f.name]
        allowed = _COMPAT.get(stype)
        assert allowed is not None, (
            f"{table}.{f.name}: unmapped spark type {stype!r} (duckdb {dtype!r}) "
            "— extend _COMPAT after confirming both engines agree on values"
        )
        assert dtype in allowed, (
            f"{table}.{f.name}: spark {stype!r} vs duckdb {dtype!r} — "
            "testdata encoding changed; check sources.tables.load_table"
        )

    # row counts agree (cheap full-file integrity check)
    n_duck = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/{table}.parquet'"
    ).fetchone()[0]
    assert sdf.count() == n_duck, f"{table}: row count diverged"
