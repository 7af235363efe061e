"""Empty-corpus robustness for the round-3 third/fourth/fifth-wave ops.

Empty partitions and empty filter results are routine at 100-TB scale;
every operator must return a schema-stable empty result, not crash.
"""
import numpy as np
import pyarrow as pa
import ray.data as rd


def _empty_docs():
    return rd.from_arrow(pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("n_chars", pa.int64())]).empty_table())


def test_empty_sampling_family(ray_session):
    from h3ray.ops.sample import (cap_per_group, repeat_by_group,
                                  stratified_sample)

    e = _empty_docs()
    assert stratified_sample(e, "doc_id", "lang", {"en": 100}).count() == 0
    assert repeat_by_group(e, "lang", {"en": 2}).count() == 0
    assert cap_per_group(e, "lang", "doc_id", k=3).count() == 0


def test_empty_scan_and_pack(ray_session):
    from h3ray.ops.scan import global_exclusive_cumsum, pack_sequences

    e = _empty_docs()
    assert global_exclusive_cumsum(e, "doc_id", "n_chars").count() == 0
    assert pack_sequences(e, "doc_id", "n_chars", budget=10).count() == 0


def test_empty_text_stages(ray_session):
    from h3ray.text.analysis import (quality_filter_stage, redact_stage,
                                     repetition_stage)
    from h3ray.text.dedup import contamination_flags, near_dedup

    e = _empty_docs()
    assert e.map_batches(quality_filter_stage(),
                         batch_format="pyarrow").count() == 0
    assert e.map_batches(redact_stage(),
                         batch_format="pyarrow").count() == 0
    assert e.map_batches(repetition_stage(),
                         batch_format="pyarrow").count() == 0
    assert contamination_flags(e, e).count() == 0
    assert near_dedup(e).count() == 0


def test_empty_driver_merged_aggregates(ray_session):
    from h3ray.ops.reduce import (grouped_mode, grouped_string_agg_distinct,
                                  pivot_counts, profile_numeric)

    e = _empty_docs()
    assert grouped_mode(e, "lang", "text").num_rows == 0
    assert grouped_string_agg_distinct(e, "lang", "text").num_rows == 0
    assert pivot_counts(e, "lang", "doc_id", [0, 1]).num_rows == 0
    prof = profile_numeric(e, ["doc_id", "n_chars"])
    assert prof.num_rows in (0, 2)  # no batches -> no combiner rows


def test_empty_tables_wave34_queries(ray_session, tmp_path):
    """Every round-4 wave-3/4 driver query returns a schema-stable empty
    result over fully-empty input tables (join outputs keep their schema
    via the typed empty seed in ops.join)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    for t in ["documents", "orders", "customer", "supplier", "nation",
              "lineitem", "part", "events", "embeddings"]:
        s = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(s.empty_table(), tmp_path / f"{t}.parquet")

    q = entry.queries()
    for name in ["order_priority_check", "nation_pair_volume",
                 "customer_order_dist", "top_supplier_revenue",
                 "disjunct_brand_revenue", "idle_rich_customers",
                 "pages_domain_stats", "docs_dup_ngram_fraction",
                 "pages_snapshot_diff", "sole_late_supplier_counts"]:
        out = q[name](str(tmp_path))
        n = out.num_rows if isinstance(out, pa.Table) else out.count()
        # disjunct_brand_revenue mirrors SQL SUM() over zero rows: one
        # NULL row is also a legal empty result.
        assert n <= 1, name


def test_empty_rollup_cube_sql_semantics(ray_session):
    """SQL GROUP BY ROLLUP/CUBE over zero rows returns the single
    ()-grouping row with COUNT 0 / SUM NULL — not zero rows. Also
    exercises revenue_local_suppliers with an empty supplier table
    (missing suppkeys must drop, never IndexError or inherit a nation)."""
    import pyarrow as pa

    from h3ray.ops.reduce import cube_counts, rollup_counts

    e = rd.from_arrow(pa.table({"a": pa.array([], pa.string()),
                                "b": pa.array([], pa.int64()),
                                "v": pa.array([], pa.int64())}))
    for fn in (rollup_counts, cube_counts):
        t = fn(e, "a", "b", "v")
        assert t.num_rows == 1
        assert t["num_rows"][0].as_py() == 0
        assert t["sum_value"][0].as_py() is None


def test_empty_supplier_local_revenue(ray_session, tmp_path):
    """An empty supplier table with non-empty lineitem: every line drops
    at the broadcast probe (inner-join semantics), result is empty."""
    import shutil

    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    src = "/root/testdata/sf0.001"
    for t in ["documents", "orders", "customer", "nation", "lineitem",
              "part", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    s = pq.read_schema(f"{src}/supplier.parquet")
    pq.write_table(s.empty_table(), tmp_path / "supplier.parquet")
    out = entry.queries()["revenue_local_suppliers"](str(tmp_path))
    n = out.num_rows if isinstance(out, pa.Table) else out.count()
    assert n == 0
