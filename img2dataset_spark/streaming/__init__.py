from img2dataset_spark.streaming.progress import (
    aggregate_progress,
    start_progress_stream,
    stats_stream,
)

__all__ = ["aggregate_progress", "start_progress_stream", "stats_stream"]
