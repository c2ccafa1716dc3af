from .events import (
    foreach_batch_upsert,
    stream_events,
    streaming_dedupe,
    streaming_session_counts,
    tumbling_counts,
)
from .cdc import append_only_cdc_dir, stream_changes

__all__ = [
    "foreach_batch_upsert",
    "stream_events",
    "streaming_dedupe",
    "streaming_session_counts",
    "tumbling_counts",
    "append_only_cdc_dir",
    "stream_changes",
]
