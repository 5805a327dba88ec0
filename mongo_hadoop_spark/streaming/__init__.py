from mongo_hadoop_spark.streaming.jobs import (  # noqa: F401
    stream_sessionized, stream_stateful_user_totals,
    stream_stateful_user_totals_tws, stream_tumbling_counts,
    streaming_events_source,
)
from mongo_hadoop_spark.streaming.sink import BucketedDocumentSink  # noqa: F401
