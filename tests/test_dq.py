"""The constraint suite must DETECT violations, not just report zeros.

The fixtures are clean (all checks 0 — asserted by oracle parity), so this
builds a deliberately dirty micro-schema and pins every check's count.
"""

from __future__ import annotations

import pytest

from mapreduce_docker_spark.operators.profile_queries import dq_constraint_checks


@pytest.fixture()
def dirty_dir(spark, tmp_path):
    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{name}.parquet"))

    w(
        "orders",
        [
            (1, 10, "O", 100.0, "1995-01-01", "1-URGENT"),
            (1, 11, "F", 200.0, "1995-01-02", "2-HIGH"),   # duplicate PK
            (2, None, "O", -5.0, "1995-01-03", "3-MEDIUM"),  # null FK + nonpos price
            (None, 12, "O", 50.0, "1995-01-04", "2-HIGH"),  # NULL PK (r11 contract)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    w(
        "lineitem",
        [
            (1, 1, 5.0, 0.05),
            (99, 2, 0.0, 0.05),   # orphan orderkey + nonpositive quantity
            (2, 1, 3.0, 1.5),     # discount out of range
        ],
        "l_orderkey long, l_linenumber long, l_quantity double, l_discount double",
    )
    w(
        "customer",
        [(10, 1), (11, 77)],  # 77 not in nation
        "c_custkey long, c_nationkey long",
    )
    w("nation", [(1,), (2,)], "n_nationkey long")
    w(
        "documents",
        [
            (0, "hello world", "en", "s", 11),
            (1, "", "en", "s", 0),          # empty text
            (2, "abc", "en", "s", 99),      # n_chars drift
            (None, "id-less", "en", "s", 7),  # NULL PK (r11 contract)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return str(tmp_path)


def test_every_check_fires_on_dirty_data(spark, dirty_dir):
    got = {
        (r["table_name"], r["check_name"]): r["violations"]
        for r in dq_constraint_checks(spark, dirty_dir).collect()
    }
    assert got[("orders", "pk_unique_o_orderkey")] == 1  # NULL PK row NOT re-counted here
    assert got[("orders", "not_null_o_orderkey")] == 1
    assert got[("orders", "not_null_o_custkey")] == 1
    assert got[("orders", "positive_o_totalprice")] == 1
    assert got[("lineitem", "positive_l_quantity")] == 1
    assert got[("lineitem", "l_discount_in_unit_range")] == 1
    assert got[("lineitem", "fk_l_orderkey_in_orders")] == 1
    assert got[("customer", "fk_c_nationkey_in_nation")] == 1
    assert got[("documents", "not_null_doc_id")] == 1
    assert got[("documents", "non_empty_text")] == 1
    assert got[("documents", "n_chars_matches_text")] == 1
    assert len(got) == 11


def test_histogram_partitions_all_orders(spark):
    from mapreduce_docker_spark.operators.profile_queries import (
        HIST_BUCKETS,
        agg_histogram_totalprice,
    )
    from tests.conftest import SF_SMOKE

    rows = sorted(
        agg_histogram_totalprice(spark, SF_SMOKE).collect(),
        key=lambda r: r["bucket_idx"],
    )
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == n_orders  # buckets partition rows
    assert [r["bucket_idx"] for r in rows] == list(range(HIST_BUCKETS))
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] == b["lo"]  # contiguous edges
