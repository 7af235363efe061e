"""Round-4 wave-3 ops: dup-ngram stats, Q13 zero bucket, Q15 ties."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

import __ray_entry__ as entry
from h3ray.text.dedup import dup_ngram_stats

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",  # exact dup
    "a completely different document about hex grids",
    "",            # padded single-shingle doc
    "ab",          # padded single-shingle doc
    "ab",          # its dup
    "xxxxxxxxxxxxxxxxxxxx",  # one distinct shingle, repeated in-doc
    "grids about hex the quick brown",  # shares shingles with 0/1/2
]


def _brute_dup_counts(texts, k=5):
    """Per-doc (n_distinct_shingles, n_shared_with_other_docs)."""
    sets = []
    for t in texts:
        if len(t) < k:
            sets.append({t.ljust(k)})
        else:
            sets.append({t[i:i + k] for i in range(len(t) - k + 1)})
    out = []
    for i, s in enumerate(sets):
        others = set()
        for j, o in enumerate(sets):
            if j != i:
                others |= o
        out.append((len(s), len(s & others)))
    return out


def test_dup_ngram_stats_matches_bruteforce(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(len(TEXTS), dtype=np.int64),
        "text": TEXTS})).repartition(3)
    got = dup_ngram_stats(ds, key_col="doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _brute_dup_counts(TEXTS)
    for i, (n, nd) in enumerate(exp):
        assert got.n_shingles[i] == n, f"doc {i} total"
        assert got.n_dup[i] == nd, f"doc {i} dup"


def test_dup_ngram_oracle_matches_pipeline(ray_session, tmp_path):
    """The DuckDB oracle string and the Ray pipeline agree on a corpus
    with dups, shorts, and empties (the driver's parity, in miniature)."""
    tbl = pa.table({"doc_id": np.arange(len(TEXTS), dtype=np.int64),
                    "text": TEXTS})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = entry.queries()["docs_dup_ngram_fraction"](str(tmp_path)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(entry.oracle_sql()["docs_dup_ngram_fraction"]) \
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert (got.n_shingles == exp.n_shingles).all()
    assert (got.n_dup == exp.n_dup).all()


def _write_q13_fixture(tmp_path):
    """5 customers; customers 3 and 4 have NO orders (the zero bucket)."""
    pq.write_table(pa.table({
        "c_custkey": np.arange(5, dtype=np.int64),
        "c_name": [f"c{i}" for i in range(5)],
        "c_nationkey": np.zeros(5, dtype=np.int32),
        "c_acctbal": np.linspace(-100.0, 9000.0, 5),
        "c_mktsegment": ["A", "B", "A", "B", "A"],
    }), tmp_path / "customer.parquet")
    ok = np.arange(7, dtype=np.int64)
    pq.write_table(pa.table({
        "o_orderkey": ok,
        "o_custkey": np.array([0, 0, 0, 1, 1, 2, 2], dtype=np.int64),
        "o_orderstatus": ["F"] * 7,
        "o_totalprice": np.full(7, 10.0),
        "o_orderdate": pa.array([np.datetime64("1995-06-01", "us")] * 7),
        "o_orderpriority": ["1-URGENT"] * 7,
    }), tmp_path / "orders.parquet")


def test_customer_order_dist_zero_bucket(ray_session, tmp_path):
    """Customers without orders must land in the c_count=0 bucket (the
    left-join null -> 0 path sf0.01 never exercises)."""
    _write_q13_fixture(tmp_path)
    got = entry.queries()["customer_order_dist"](str(tmp_path))
    df = (got.to_pandas() if hasattr(got, "to_pandas") else got) \
        if not isinstance(got, pa.Table) else got.to_pandas()
    df = df.sort_values("c_count").reset_index(drop=True)
    assert df.c_count.tolist() == [0, 2, 3]
    assert df.custdist.tolist() == [2, 2, 1]


def test_top_supplier_revenue_ties(ray_session, tmp_path):
    """Two suppliers tied on max revenue: both must be returned."""
    pq.write_table(pa.table({
        "s_suppkey": np.array([10, 20, 30], dtype=np.int64),
        "s_name": ["sa", "sb", "sc"],
        "s_nationkey": np.zeros(3, dtype=np.int32),
        "s_acctbal": np.zeros(3),
    }), tmp_path / "supplier.parquet")
    ship = pa.array([np.datetime64("1996-02-01", "us")] * 5)
    pq.write_table(pa.table({
        "l_orderkey": np.arange(5, dtype=np.int64),
        "l_partkey": np.zeros(5, dtype=np.int64),
        "l_suppkey": np.array([10, 10, 20, 20, 30], dtype=np.int64),
        "l_linenumber": np.ones(5, dtype=np.int32),
        "l_quantity": np.ones(5),
        "l_extendedprice": np.array([50.0, 50.0, 60.0, 40.0, 10.0]),
        "l_discount": np.zeros(5),
        "l_tax": np.zeros(5),
        "l_returnflag": ["N"] * 5,
        "l_linestatus": ["O"] * 5,
        "l_shipdate": ship,
    }), tmp_path / "lineitem.parquet")
    got = entry.queries()["top_supplier_revenue"](str(tmp_path))
    df = got.to_pandas() if isinstance(got, pa.Table) else got.to_pandas()
    df = df.sort_values("s_suppkey").reset_index(drop=True)
    assert df.s_suppkey.tolist() == [10, 20]
    assert df.total_revenue_cents.tolist() == [10000, 10000]


def test_snapshot_diff_all_statuses(ray_session):
    """At sf0.001 all four diff statuses appear and partition the union
    of the two snapshots (memberships recomputed here from the same
    salted-mix64 rules)."""
    import pyarrow.parquet as pq2

    from h3ray.io.pages import _mix64

    got = entry.queries()["pages_snapshot_diff"]("/root/testdata/sf0.001")
    df = got.to_pandas()
    counts = df.status.value_counts().to_dict()
    assert set(counts) == {"added", "removed", "changed", "unchanged"}

    did = pq2.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"])["doc_id"].to_numpy()
    h = _mix64(did.astype(np.uint64))
    ina = _mix64(h + np.uint64(101)) % np.uint64(10) != 0
    inb = _mix64(h + np.uint64(202)) % np.uint64(10) != 0
    assert len(df) == int((ina | inb).sum())
    assert counts["added"] == int((~ina & inb).sum())
    assert counts["removed"] == int((ina & ~inb).sum())
    assert df.doc_id.is_unique


def test_sole_late_supplier_counts_known_answer(ray_session, tmp_path):
    """Hand-built orders: order 0 has 2 suppliers / 1 late (counts),
    order 1 has 2 suppliers / 2 late (excluded), order 2 has 1 supplier
    late (excluded: single-supplier)."""
    pq.write_table(pa.table({
        "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
        "s_name": ["sa", "sb", "sc"],
        "s_nationkey": np.zeros(3, dtype=np.int32),
        "s_acctbal": np.zeros(3),
    }), tmp_path / "supplier.parquet")
    od = np.datetime64("1995-01-01", "us")
    late = np.datetime64("1995-06-01", "us")   # > 90 days after od
    ontime = np.datetime64("1995-02-01", "us")
    ok = np.array([0, 0, 1, 1, 2], dtype=np.int64)
    sk = np.array([1, 2, 1, 2, 3], dtype=np.int64)
    ship = pa.array([late, ontime, late, late, late])
    pq.write_table(pa.table({
        "l_orderkey": ok, "l_partkey": np.zeros(5, dtype=np.int64),
        "l_suppkey": sk, "l_linenumber": np.ones(5, dtype=np.int32),
        "l_quantity": np.ones(5), "l_extendedprice": np.ones(5),
        "l_discount": np.zeros(5), "l_tax": np.zeros(5),
        "l_returnflag": ["N"] * 5, "l_linestatus": ["O"] * 5,
        "l_shipdate": ship,
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": np.arange(3, dtype=np.int64),
        "o_custkey": np.zeros(3, dtype=np.int64),
        "o_orderstatus": ["F"] * 3,
        "o_totalprice": np.zeros(3),
        "o_orderdate": pa.array([od] * 3),
        "o_orderpriority": ["1-URGENT"] * 3,
    }), tmp_path / "orders.parquet")
    got = entry.queries()["sole_late_supplier_counts"](str(tmp_path))
    df = got.to_pandas() if isinstance(got, pa.Table) else got.to_pandas()
    assert df.s_name.tolist() == ["sa"]
    assert df.numwait.tolist() == [1]
