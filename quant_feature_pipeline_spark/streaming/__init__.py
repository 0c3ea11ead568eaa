from .micro import stream_bars_from_dir, streaming_resample, streaming_session_counts

__all__ = ["stream_bars_from_dir", "streaming_resample", "streaming_session_counts"]
