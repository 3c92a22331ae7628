from excelstream_spark.streaming.pipelines import (
    events_stream,
    hourly_windowed_counts,
    run_available_now,
    sessionized_windows,
)

__all__ = [
    "events_stream",
    "hourly_windowed_counts",
    "sessionized_windows",
    "run_available_now",
]
