from .micro import stream_bars_from_dir, streaming_resample, streaming_session_counts
from .stateful import streaming_ema

__all__ = ["stream_bars_from_dir", "streaming_resample", "streaming_session_counts", "streaming_ema"]
