from glue_etl_framework_spark.streaming.ingest import (  # noqa: F401
    incremental_file_ingest,
    read_file_stream,
    stream_dedup,
    stream_session_agg,
    stream_window_agg,
)
from glue_etl_framework_spark.streaming.stateful import (  # noqa: F401
    running_user_stats,
    user_profile_stream,
)
from glue_etl_framework_spark.streaming.joins import (  # noqa: F401
    stream_stream_join,
    upsert_sink,
)
from glue_etl_framework_spark.streaming.quality import (  # noqa: F401
    pii_scrub_stream,
    quality_gate_stream,
)
