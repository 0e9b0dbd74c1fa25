from .pipeline import (
    events_file_stream,
    risk_stream,
    streaming_window_metrics,
    write_console,
    write_jdbc_metrics,
    write_memory,
)

__all__ = [
    "events_file_stream",
    "risk_stream",
    "streaming_window_metrics",
    "write_console",
    "write_jdbc_metrics",
    "write_memory",
]
