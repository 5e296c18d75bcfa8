"""Stats contract tests (ref src/main.rs:1021-1048)."""

import math

from whisper_tpu.utils.stats import percentile, stat_block


def test_percentile_linear_interp():
    xs = [1.0, 2.0, 3.0, 4.0]
    assert percentile(xs, 0) == 1.0
    assert percentile(xs, 100) == 4.0
    assert percentile(xs, 50) == 2.5
    # k = 3 * 0.95 = 2.85 -> 3 + 0.85*(4-3)
    assert abs(percentile(xs, 95) - 3.85) < 1e-12


def test_percentile_empty_is_nan():
    assert math.isnan(percentile([], 95))


def test_stat_block_upper_median():
    # Reference median is v[len/2] (upper median), NOT interpolated.
    xs = [4.0, 1.0, 3.0, 2.0]
    b = stat_block(xs)
    assert b["median"] == 3.0
    assert b["min"] == 1.0 and b["max"] == 4.0
    assert b["mean"] == 2.5


def test_stat_block_keys():
    assert set(stat_block([1.0])) == {"min", "median", "p90", "p95", "max", "mean"}
