from tmp_parquet_merge_spark.streaming.windows import (  # noqa: F401
    dedup_events,
    read_events_stream,
    run_to_memory_sink,
    sessionized,
    sliding_counts,
    tumbling_counts,
)
