"""The generated DuckDB oracle SQL must stay bit-exact with the kernels.

These run the hash/minhash/simhash oracle strings from __ray_entry__ against
a tiny in-memory documents table and compare with the Python kernels — the
same parity the driver checks at sf0.01, but cheap enough for every pytest
run and independent of the test-data directory.
"""

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __ray_entry__ as entry  # noqa: E402
from h3ray.io.pages import url_hash64  # noqa: E402
from h3ray.text import dedup  # noqa: E402
from h3ray.text.analysis import langid_stage  # noqa: E402

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "der schnelle braune fuchs und die faule katze ist nicht da",
    "le renard brun et rapide est pour la table que nous avons",
    "",
    "ab",
    "data stream hex grid page crawl index sphere tile join",
    "data stream hex grid page crawl index sphere tile join",  # exact dup
    "x" * 150,
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    tbl = pa.Table.from_arrays(
        [pa.array(np.arange(len(TEXTS), dtype=np.int64)), pa.array(TEXTS)],
        names=["doc_id", "text"])
    c.register("documents", tbl)
    return c


def test_fingerprint_oracle_matches_kernel(con):
    got = dict(con.execute(entry.oracle_sql()["docs_fingerprints"])
               .fetchall())
    exp = url_hash64(pa.array(TEXTS)).view(np.int64)
    for i in range(len(TEXTS)):
        assert got[i] == exp[i], f"doc {i}"


def test_simhash_oracle_matches_kernel(con):
    got = dict(con.execute(entry.oracle_sql()["simhash_fingerprints"])
               .fetchall())
    exp = dedup.simhash_batch(TEXTS).view(np.int64)
    for i in range(len(TEXTS)):
        assert got[i] == exp[i], f"doc {i}"


def test_langid_oracle_matches_kernel(con):
    got = dict(con.execute(entry.oracle_sql()["langid_predictions"])
               .fetchall())
    out = langid_stage()(pa.Table.from_arrays(
        [pa.array(np.arange(len(TEXTS), dtype=np.int64)),
         pa.array(TEXTS)], names=["doc_id", "text"]))
    exp = out["lang_pred"].to_pylist()
    for i in range(len(TEXTS)):
        assert got[i] == exp[i], f"doc {i}"


def test_minhash_pairs_oracle_matches_kernel(con):
    got = set(map(tuple,
                  con.execute(entry.oracle_sql()["minhash_dup_pairs"])
                  .fetchall()))
    # Reference star pairs from the Python signature kernel.
    sig = dedup.minhash_signature_batch(TEXTS)
    bands = sig.reshape(len(TEXTS), dedup.N_BANDS, dedup.ROWS_PER_BAND)
    from h3ray.io.pages import _mix64

    bh = _mix64(bands[..., 0] * np.uint64(3) ^ _mix64(bands[..., 1])
                ^ (_mix64(bands[..., 2]) >> np.uint64(1))
                ^ (_mix64(bands[..., 3]) << np.uint64(1)))
    exp = set()
    for b in range(dedup.N_BANDS):
        vals: dict = {}
        for d in range(len(TEXTS)):
            vals.setdefault(int(bh[d, b]), []).append(d)
        for run in vals.values():
            for other in run[1:]:
                exp.add((run[0], other))
    assert got == exp
    assert (5, 6) in got  # the planted exact dup collides in every band
