from xmlschema_spark.streaming.validate import (  # noqa: F401
    streaming_row_violations,
    validate_stream,
    windowed_verdicts,
)
from xmlschema_spark.streaming.stateful import cumulative_verdicts  # noqa: F401
from xmlschema_spark.streaming.dedup import (  # noqa: F401
    drop_duplicates_stream,
    exact_dedup_stream,
    near_dedup_stream,
)
from xmlschema_spark.streaming.drift import windowed_divergence, windowed_psi  # noqa: F401
from xmlschema_spark.streaming.stats import (  # noqa: F401
    live_profile,
    streaming_partition_sketches,
)
from xmlschema_spark.streaming.sessions import session_stats_stream  # noqa: F401
from xmlschema_spark.streaming.quality import quality_monitor_stream  # noqa: F401
from xmlschema_spark.streaming.identity import (  # noqa: F401
    duplicate_keys_stream,
    keyref_orphans_foreach_batch,
)
