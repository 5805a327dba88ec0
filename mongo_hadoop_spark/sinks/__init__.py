from mongo_hadoop_spark.sinks.writers import (  # noqa: F401
    UpdateSpec, apply_pending_updates, write_documents,
)
