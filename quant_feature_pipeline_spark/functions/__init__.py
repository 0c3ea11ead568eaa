from .indicators import (
    sma,
    rolling_std,
    bollinger_width,
    roc_momentum,
    realized_vol,
    rolling_zscore,
    rolling_volume_sum,
)
from .recurrence import compute_recurrence_indicators
from .rank import rolling_percentile_rank
from .normalize import winsorize_tanh, tanh_compress, power_calibrate
from .timefeat import time_encodings

__all__ = [
    "sma",
    "rolling_std",
    "bollinger_width",
    "roc_momentum",
    "realized_vol",
    "rolling_zscore",
    "rolling_volume_sum",
    "compute_recurrence_indicators",
    "rolling_percentile_rank",
    "winsorize_tanh",
    "tanh_compress",
    "power_calibrate",
    "time_encodings",
]
