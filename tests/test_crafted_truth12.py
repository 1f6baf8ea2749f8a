"""Crafted-corpus truths for two r6-window r1-era queries whose SQL
semantics are easy for two engines to share a misunderstanding about:
EXCEPT ALL's multiset surplus arithmetic, and RANGE frames' value-based
(peer-inclusive, boundary-inclusive) windowing. The oracle proves engine
== DuckDB; these prove both == a hand-computed answer.
"""

from __future__ import annotations

from collections import Counter

from mapreduce_docker_spark.operators.relational_queries import (
    setop_exceptall_priorities,
    window_range_price_band,
)

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_orderpriority string, o_totalprice double"
)


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(rows, _ORDERS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_exceptall_multiset_surplus_hand_computed(spark, tmp_path):
    """EXCEPT ALL keeps SURPLUS occurrences: max(n_left - n_right, 0) per
    value — not set difference (P2 appears on both sides and vanishes even
    though the right side has MORE), not bag-min intersection."""
    rows = [
        # status O: P1 x3, P2 x1, P3 x1
        (1, 1, "O", "1-URGENT", 100.0),
        (2, 1, "O", "1-URGENT", 100.0),
        (3, 1, "O", "1-URGENT", 100.0),
        (4, 1, "O", "2-HIGH", 100.0),
        (5, 1, "O", "3-MEDIUM", 100.0),
        # status F: P1 x1, P2 x2
        (6, 1, "F", "1-URGENT", 100.0),
        (7, 1, "F", "2-HIGH", 100.0),
        (8, 1, "F", "2-HIGH", 100.0),
        # status P: must not participate on either side
        (9, 1, "P", "1-URGENT", 100.0),
    ]
    sf_dir = _write_orders(spark, tmp_path, rows)
    got = Counter(
        r["o_orderpriority"]
        for r in setop_exceptall_priorities(spark, sf_dir).collect()
    )
    # P1: 3 - 1 = 2 survive; P2: 1 - 2 -> 0 (clamped); P3: 1 - 0 = 1
    assert got == Counter({"1-URGENT": 2, "3-MEDIUM": 1})


def test_range_frame_value_band_hand_computed(spark, tmp_path):
    """RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW is a VALUE band:
    rows land in the frame iff price >= current - 10000 (boundary
    inclusive, one-over excluded), and equal-price PEERS count in each
    other's frame — a ROWS frame would get every one of these wrong."""
    rows = [
        # customer 1: 100, 5000, 10100 (100 sits exactly on its 10000
        # boundary), 20101 (10100 is one past its boundary)
        (1, 1, "O", "1-URGENT", 100.0),
        (2, 1, "O", "1-URGENT", 5000.0),
        (3, 1, "O", "1-URGENT", 10100.0),
        (4, 1, "O", "1-URGENT", 20101.0),
        # customer 2: duplicate prices are peers — both 500-rows see both
        (5, 2, "O", "1-URGENT", 500.0),
        (6, 2, "O", "1-URGENT", 500.0),
        (7, 2, "O", "1-URGENT", 20000.0),
    ]
    sf_dir = _write_orders(spark, tmp_path, rows)
    got = {
        r["o_orderkey"]: r["n_in_band"]
        for r in window_range_price_band(spark, sf_dir).collect()
    }
    assert got == {
        1: 1,  # {100}
        2: 2,  # {100, 5000}
        3: 3,  # {100, 5000, 10100}: 10100-10000=100, boundary INCLUSIVE
        4: 1,  # {20101}: 20101-10000=10101 > 10100, one-over EXCLUDED
        5: 2,  # peer rows share the frame
        6: 2,
        7: 1,  # 20000-10000=10000 > 500
    }


def test_first_last_nth_full_frame_hand_computed(spark, tmp_path):
    """first/last/nth_value over the explicit unbounded frame: last_value
    must be the PARTITION's last row (the default RANGE frame would make
    it the current row — the classic trap the note documents), date ties
    break by o_orderkey, and nth_value(2) is NULL for 1-row partitions."""
    import datetime as dt

    schema = (
        "o_orderkey long, o_custkey long, o_orderdate date, "
        "o_orderstatus string, o_orderpriority string, o_totalprice double"
    )
    d = dt.date
    rows = [
        # customer 1: dates 2024-01-03 < {01-05 tie: keys 11 < 12} < 01-09
        (12, 1, d(2024, 1, 5), "O", "1-URGENT", 1.0),
        (7, 1, d(2024, 1, 3), "O", "1-URGENT", 1.0),
        (11, 1, d(2024, 1, 5), "O", "1-URGENT", 1.0),
        (20, 1, d(2024, 1, 9), "O", "1-URGENT", 1.0),
        # customer 2: single order -> second_orderkey NULL
        (30, 2, d(2024, 2, 1), "O", "1-URGENT", 1.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    from mapreduce_docker_spark.operators.relational_queries import (
        window_first_last_orders,
    )

    got = {
        r["o_orderkey"]: (
            r["first_orderkey"], r["latest_orderkey"], r["second_orderkey"]
        )
        for r in window_first_last_orders(spark, str(tmp_path)).collect()
    }
    # order: 7 (01-03), 11 (01-05, key tiebreak), 12 (01-05), 20 (01-09)
    assert got[7] == (7, 20, 11)
    assert got[11] == (7, 20, 11)   # every row sees the FULL partition
    assert got[12] == (7, 20, 11)
    assert got[20] == (7, 20, 11)   # last row's last_value is itself
    assert got[30] == (30, 30, None)
