from las_vpe_platform_spark.streaming.engine import (  # noqa: F401
    file_stream,
    foreach_batch_upsert,
    kafka_sink,
    kafka_stream,
    read_upsert_table,
    run_to_completion,
    stream_term_sig_filter,
    watermarked_full_outer_join,
    windowed_counts,
)
