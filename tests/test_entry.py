"""Smoke test for the driver contract in __ray_entry__.py.

The driver calls entry() after its own ray.init() and expects >=0 rows with
a stable schema; queries() and oracle_sql() keys must line up (every oracle
key must have a query). This guards that contract locally.
"""
from pathlib import Path

import pytest

SF_DIR = Path("/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not SF_DIR.exists(), reason="driver testdata not present"
)


def test_entry_runs_and_has_stable_schema(ray_session):
    import __ray_entry__ as e

    result = e.entry()
    if hasattr(result, "schema"):  # ray.data.Dataset
        names = set(result.schema().names)
        n = result.count()
    else:  # pandas.DataFrame
        names = set(result.columns)
        n = len(result)
    assert {"parent_r2", "num_pages"} <= names
    assert n > 0


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # every callable takes one positional sf_dir argument
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())
