"""Distributed two-pass percentile selection vs the direct order statistic."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from h3ray.ops.quantile import grouped_percentile_disc


def _disc(vals, q):
    """Reference PERCENTILE_DISC: smallest value with cume_dist >= q."""
    s = np.sort(vals)
    return float(s[max(int(np.ceil(q * s.shape[0])), 1) - 1])


@pytest.mark.parametrize("q", [0.5, 0.9, 1.0])
def test_grouped_percentile_matches_reference(ray_session, q):
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 4, 5000)
    # Mixed sign + heavy ties + odd/even group sizes.
    vals = np.round(rng.standard_normal(5000) * 100, 1)
    vals[keys == 3] = 7.25  # an all-equal group (single-bin worst case)
    tbl = pa.table({"k": pa.array([f"g{k}" for k in keys]),
                    "value": pa.array(vals)})
    out = grouped_percentile_disc(rd.from_arrow(tbl).repartition(8),
                                  "k", "value", q=q).to_pandas()
    got = dict(zip(out.k, out.percentile_value))
    for k in range(4):
        assert got[f"g{k}"] == _disc(vals[keys == k], q), f"group {k} q={q}"


def test_grouped_percentile_empty_and_bad_q(ray_session):
    empty = pa.table({"k": pa.array([], type=pa.string()),
                      "value": pa.array([], type=pa.float64())})
    out = grouped_percentile_disc(rd.from_arrow(empty), "k", "value")
    assert len(out.to_pandas()) == 0
    with pytest.raises(ValueError, match="q must be"):
        grouped_percentile_disc(rd.from_arrow(empty), "k", "value", q=0.0)
