from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

from quant_feature_pipeline_spark.session import get_spark

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="qfps-tests",
        cpus=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


def make_bars_pdf(
    n: int = 400,
    entities: tuple[str, ...] = ("A", "B"),
    seed: int = 42,
    freq_s: int = 60,
    gap_every: int | None = None,
) -> pd.DataFrame:
    """Deterministic random-walk OHLCV bars (FIXTURES.md F1): clean grid,
    optional gaps. Positive prices; low<=min(o,c)<=max(o,c)<=high."""
    rng = np.random.RandomState(seed)
    frames = []
    for ei, e in enumerate(entities):
        ts = pd.date_range(T0, periods=n, freq=f"{freq_s}s")
        close = 100.0 * np.exp(np.cumsum(rng.randn(n)) * 0.002 + ei)
        open_ = np.concatenate([[close[0]], close[:-1]])
        spread = 1.0 + rng.rand(n) * 0.01
        pdf = pd.DataFrame(
            {
                "entity": e,
                "ts": ts,
                "open": open_,
                "high": np.maximum(open_, close) * spread,
                "low": np.minimum(open_, close) / spread,
                "close": close,
                "volume": rng.randint(1, 1000, n).astype(float),
            }
        )
        if gap_every:
            pdf = pdf[pdf.index % gap_every != 3].reset_index(drop=True)
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)


def assert_frame_close(a: pd.DataFrame, b: pd.DataFrame, keys: list[str], rtol=1e-9, atol=1e-9):
    """Order-insensitive compare: sort by keys, allclose floats, exact rest."""
    a = a.sort_values(keys).reset_index(drop=True)
    b = b.sort_values(keys).reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns), (sorted(a.columns), sorted(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            np.testing.assert_allclose(
                a[c].to_numpy(dtype=float),
                b[c].to_numpy(dtype=float),
                rtol=rtol,
                atol=atol,
                equal_nan=True,
                err_msg=f"column {c}",
            )
        else:
            pd.testing.assert_series_equal(
                a[c], b[c], check_dtype=False, check_names=False, obj=f"column {c}"
            )
