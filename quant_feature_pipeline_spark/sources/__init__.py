from .bars import bars_from_events, bars_from_tokens
from .tokens import synth_token_table
from .scan import read_table, read_csv_bars, dedup_keep_last, slice_time_range
from .sink import write_table

__all__ = [
    "bars_from_events",
    "bars_from_tokens",
    "synth_token_table",
    "read_table",
    "read_csv_bars",
    "dedup_keep_last",
    "slice_time_range",
    "write_table",
]
