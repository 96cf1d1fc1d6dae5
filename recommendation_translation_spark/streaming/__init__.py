from .events_stream import stream_tumbling_agg, run_stream_to_memory

__all__ = ["stream_tumbling_agg", "run_stream_to_memory"]
