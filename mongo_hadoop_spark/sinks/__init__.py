from mongo_hadoop_spark.sinks.writers import (  # noqa: F401
    UpdateSpec, apply_pending_updates, template_update_builder, write_documents,
)
