from las_vpe_platform_spark.sources.tables import load_table  # noqa: F401
