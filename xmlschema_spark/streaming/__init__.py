from xmlschema_spark.streaming.validate import (  # noqa: F401
    streaming_row_violations,
    validate_stream,
)
