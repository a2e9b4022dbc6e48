from .convert_stream import start_flowlog_stream  # noqa: F401
from .windows import (  # noqa: F401
    sessionized,
    sliding_counts,
    streaming_dedup,
    tumbling_agg,
)
