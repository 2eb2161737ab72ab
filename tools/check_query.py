"""Quick single-query oracle parity check (mirrors test_oracle_parity).

Usage: python tools/check_query.py <query_name> [...]
Runs each named catalog entry at sf0.01 against its DuckDB oracle and
prints OK/FAIL with row counts and timings — the fast dev loop while
authoring a new entry."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from las_vpe_platform_spark.session import get_spark
from las_vpe_platform_spark.queries import CATALOG
from tests.test_oracle_parity import _normalize

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
names = sys.argv[1:]
spark = get_spark("exp_check", cpus=8)
duck = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"):
    duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

for name in names:
    fn, sql = CATALOG[name]
    t0 = time.time()
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    t1 = time.time()
    from las_vpe_platform_spark.operators.staging import unpersist_all
    unpersist_all()
    if sql is None:
        print(f"{name}: rows-only, {len(srows)} rows, {t1-t0:.1f}s")
        continue
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    t2 = time.time()
    ok_cols = sorted(sdf.columns) == sorted(dcols)
    ok_rows = len(srows) == len(drows)
    sn = _normalize(srows, sdf.columns)
    dn = _normalize(drows, dcols)
    mism = [(a, b) for a, b in zip(sn, dn) if a != b]
    status = "OK" if (ok_cols and ok_rows and not mism) else "FAIL"
    print(f"{name}: {status} spark={len(srows)} oracle={len(drows)} "
          f"cols_ok={ok_cols} spark_t={t1-t0:.1f}s duck_t={t2-t1:.1f}s")
    if status == "FAIL":
        if not ok_cols:
            print("  spark cols:", sdf.columns, " duck cols:", dcols)
        for a, b in mism[:5]:
            print("  spark:", a)
            print("  duck :", b)
