"""Unit tests for readability_ray.functions.relational (TPC-H shapes)."""

import numpy as np
import pandas as pd


def _ds(ray, df):
    import pyarrow as pa
    import ray.data
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False))


def test_pricing_summary_exact_fixed_point(ray_session):
    import ray
    from readability_ray.functions import pricing_summary
    li = pd.DataFrame({
        "l_returnflag": ["A", "A", "N", "N", "A"],
        "l_linestatus": ["F", "F", "O", "O", "F"],
        "l_quantity": [10.0, 20.0, 5.0, 1.0, 3.0],
        "l_extendedprice": [100.10, 200.20, 50.05, 10.01, 999.99],
        "l_discount": [0.05, 0.10, 0.0, 0.07, 0.01],
        "l_shipdate": pd.to_datetime(
            ["1999-01-01", "1999-06-01", "1999-01-01", "1999-01-01",
             "2001-01-01"]),  # last row excluded by the cutoff
    })
    df = pricing_summary(_ds(ray, li)).to_pandas() \
        .set_index(["l_returnflag", "l_linestatus"])
    assert df.loc[("A", "F"), "sum_qty"] == 30
    assert df.loc[("A", "F"), "sum_base_price_cents"] == 10010 + 20020
    assert df.loc[("A", "F"), "sum_disc_price_c4"] == \
        10010 * 95 + 20020 * 90
    assert df.loc[("A", "F"), "count_order"] == 2
    assert df.loc[("A", "F"), "avg_qty"] == 15.0
    assert df.loc[("N", "O"), "sum_qty"] == 6
    assert len(df) == 2  # the 2001 row fell to the filter


def test_segment_top_orders(ray_session):
    import ray
    from readability_ray.functions import segment_top_orders
    cust = pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", "BUILDING"],
    })
    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12, 13],
        "o_custkey": [1, 2, 3, 1],
        "o_orderdate": pd.to_datetime(
            ["1997-01-01", "1997-01-01", "1997-06-01", "1998-06-01"]),
    })  # order 11: wrong segment; order 13: after cutoff
    li = pd.DataFrame({
        "l_orderkey": [10, 10, 11, 12, 12, 13],
        "l_extendedprice": [100.0, 50.0, 999.0, 200.0, 1.0, 5.0],
        "l_discount": [0.0, 0.10, 0.0, 0.05, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(
            ["1998-06-01", "1998-06-02", "1998-06-01", "1998-06-01",
             "1997-01-01", "1998-06-01"]),  # 12's second line too early
    })
    df = segment_top_orders(_ds(ray, cust), _ds(ray, orders),
                            _ds(ray, li), n=10).to_pandas()
    got = dict(zip(df.o_orderkey, df.revenue_c4))
    assert got == {10: 10000 * 100 + 5000 * 90, 12: 20000 * 95}
    # ordered by revenue desc
    assert list(df.o_orderkey) == [12, 10] if got[12] > got[10] \
        else [10, 12]
    assert list(df.revenue_c4) == sorted(df.revenue_c4, reverse=True)


def test_region_nation_revenue_broadcast_dims(ray_session):
    import ray
    from readability_ray.functions import region_nation_revenue
    region = pd.DataFrame({"r_regionkey": [0, 1],
                           "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame({"n_nationkey": [10, 11, 20],
                           "n_name": ["JP", "IN", "FR"],
                           "n_regionkey": [0, 0, 1]})
    supplier = pd.DataFrame({"s_suppkey": [1, 2, 3],
                             "s_nationkey": [10, 11, 20]})
    cust = pd.DataFrame({"c_custkey": [100, 101, 102],
                         "c_nationkey": [10, 11, 20]})
    orders = pd.DataFrame({
        "o_orderkey": [1000, 1001, 1002],
        "o_custkey": [100, 101, 102],
        "o_orderdate": pd.to_datetime(
            ["1996-05-01", "1996-06-01", "1996-07-01"]),
    })
    li = pd.DataFrame({
        # order 1000 (cust JP): JP supplier (match) + IN supplier (no)
        # order 1001 (cust IN): IN supplier (match)
        # order 1002 (cust FR): FR supplier — right nation pair but
        #   FR is EUROPE, excluded by the region filter
        "l_orderkey": [1000, 1000, 1001, 1002],
        "l_suppkey": [1, 2, 2, 3],
        "l_extendedprice": [100.0, 50.0, 200.0, 999.0],
        "l_discount": [0.0, 0.0, 0.10, 0.0],
    })
    df = region_nation_revenue(
        _ds(ray, cust), _ds(ray, orders), _ds(ray, li),
        _ds(ray, supplier), _ds(ray, nation), _ds(ray, region),
        region_name="ASIA").to_pandas()
    got = dict(zip(df.n_name, df.revenue_c4))
    assert got == {"JP": 10000 * 100, "IN": 20000 * 90}


def test_segment_top_orders_tiebreak(ray_session):
    """Equal revenues order by orderkey asc — the determinism the
    oracle comparison relies on."""
    import ray
    from readability_ray.functions import segment_top_orders
    cust = pd.DataFrame({"c_custkey": [1],
                         "c_mktsegment": ["BUILDING"]})
    orders = pd.DataFrame({
        "o_orderkey": [22, 21, 23],
        "o_custkey": [1, 1, 1],
        "o_orderdate": pd.to_datetime(["1997-01-01"] * 3),
    })
    li = pd.DataFrame({
        "l_orderkey": [22, 21, 23],
        "l_extendedprice": [100.0, 100.0, 100.0],
        "l_discount": [0.0, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(["1998-06-01"] * 3),
    })
    df = segment_top_orders(_ds(ray, cust), _ds(ray, orders),
                            _ds(ray, li), n=2).to_pandas()
    assert list(df.o_orderkey) == [21, 22]


def test_forecast_revenue_q6(ray_session):
    import ray
    from readability_ray.functions import forecast_revenue
    li = pd.DataFrame({
        "l_shipdate": pd.to_datetime(
            ["1996-06-01", "1996-06-02", "1996-06-03", "1997-06-01",
             "1996-06-04"]),
        "l_discount": [0.05, 0.07, 0.04, 0.06, 0.06],
        "l_quantity": [10.0, 23.0, 5.0, 5.0, 24.0],
        "l_extendedprice": [100.00, 200.00, 300.00, 400.00, 500.00],
    })
    # rows: 0 in (disc 5bp, qty<24) ✓; 1 ✓; 2 disc 4bp ✗;
    # 3 out of window ✗; 4 qty=24 ✗
    df = forecast_revenue(_ds(ray, li)).to_pandas()
    assert len(df) == 1
    assert df["revenue_c4"].iloc[0] == 10000 * 5 + 20000 * 7
    assert df["n_lines"].iloc[0] == 2


def test_priority_line_counts_q12(ray_session):
    import ray
    from readability_ray.functions import priority_line_counts
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderpriority": ["1-URGENT", "5-LOW", "2-HIGH"],
    })
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3, 3],
        "l_returnflag": ["A", "N", "A", "A", "N"],
        "l_shipdate": pd.to_datetime(
            ["1996-01-05", "1996-02-05", "1996-03-05", "1996-04-05",
             "1999-01-01"]),  # last line outside the window
    })
    df = priority_line_counts(_ds(ray, orders), _ds(ray, li),
                              n_partitions=2).to_pandas() \
        .set_index("l_returnflag")
    # A: order1(urgent)+order2(low)+order3(high) → high 2, low 1
    assert df.loc["A", "high_line_count"] == 2
    assert df.loc["A", "low_line_count"] == 1
    # N: order1(urgent) only (1999 line filtered)
    assert df.loc["N", "high_line_count"] == 1
    assert df.loc["N", "low_line_count"] == 0
    assert list(df.index) == ["A", "N"]  # sorted


def test_promo_revenue_share_q14(ray_session):
    import ray
    from readability_ray.functions import promo_revenue_share
    part = pd.DataFrame({
        "p_partkey": [0, 1, 2],
        "p_type": ["PROMO BRUSHED", "STANDARD POLISHED", "PROMO PLATED"],
    })
    li = pd.DataFrame({
        "l_shipdate": pd.to_datetime(
            ["1996-03-10", "1996-03-11", "1996-03-12", "1996-05-01"]),
        "l_partkey": [0, 1, 2, 0],
        "l_extendedprice": [100.00, 200.00, 50.00, 999.00],
        "l_discount": [0.0, 0.10, 0.02, 0.0],
    })  # last row outside the month
    df = promo_revenue_share(_ds(ray, li), _ds(ray, part)).to_pandas()
    promo = 10000 * 100 + 5000 * 98
    total = promo + 20000 * 90
    assert df["promo_revenue_c4"].iloc[0] == promo
    assert df["total_revenue_c4"].iloc[0] == total
    assert df["promo_pct"].iloc[0] == np.floor(
        100.0 * promo / total * 1e6) / 1e6


def test_weighted_order_sample_join_weights(ray_session):
    import ray
    from readability_ray.functions import weighted_order_sample
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": pd.to_datetime(
            ["1996-01-01", "1996-01-02", "1996-01-03"]),
    })
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_extendedprice": [100.0, 50.0, 200.0, 10.0],
        "l_discount": [0.0, 0.10, 0.05, 0.0],
    })
    out = weighted_order_sample(_ds(ray, orders), _ds(ray, li), k=2,
                                n_partitions=2).to_pandas()
    assert len(out) == 2
    # keys descend; revenue exact c4
    assert list(out["sample_key"]) == sorted(out["sample_key"],
                                             reverse=True)
    rev = dict(zip(out["o_orderkey"], out["revenue_c4"]))
    expected = {1: 10000 * 100 + 5000 * 90, 2: 20000 * 95, 3: 1000 * 100}
    for okey, r in rev.items():
        assert r == expected[okey]
    # deterministic: same draw twice
    out2 = weighted_order_sample(_ds(ray, orders), _ds(ray, li), k=2,
                                 n_partitions=3).to_pandas()
    assert list(out["o_orderkey"]) == list(out2["o_orderkey"])


def test_order_priority_counts_semi_join(ray_session):
    """Q4 shape: EXISTS semantics — an order with THREE matching lines
    counts once; an order with none counts zero; outside-window orders
    excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import order_priority_counts

    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array(
            np.array(["1996-02-01", "1996-03-01", "1996-04-01",
                      "1999-01-01"], dtype="datetime64[us]")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "3-MEDIUM", "1-URGENT"],
            pa.string()),
    }))
    lineitem = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 3, 4], pa.int64()),
        "l_returnflag": pa.array(["R", "R", "R", "N", "R"],
                                 pa.string()),
    }))
    out = order_priority_counts(orders, lineitem,
                                n_partitions=2).to_pandas()
    # order 1: 3 R-lines -> counts ONCE; order 2: no lines; order 3:
    # only N; order 4: R but outside window
    expect = pd.DataFrame({"o_orderpriority": ["1-URGENT"],
                           "order_count": [1]})
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True),
        expect.astype({"order_count": "int64"}))


def test_inactive_customers_anti_join(ray_session):
    """NOT EXISTS: a customer with an in-window order is excluded even
    with 3 orders; out-of-window orders don't count as activity."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import inactive_customers

    customer = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_mktsegment": pa.array(
            ["BUILDING", "BUILDING", "MACHINERY", "MACHINERY"],
            pa.string()),
    }))
    orders = ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 1, 3, 4], pa.int64()),
        "o_orderdate": pa.array(np.array(
            ["1996-02-01", "1996-03-01", "1996-04-01", "1999-01-01",
             "1996-06-01"], dtype="datetime64[us]")),
    }))
    out = inactive_customers(customer, orders,
                             n_partitions=2).to_pandas()
    # cust 1 active (3 windows orders, counts once as active); cust 2
    # no orders at all; cust 3 only out-of-window; cust 4 active
    expect = pd.DataFrame({
        "c_mktsegment": ["BUILDING", "MACHINERY"],
        "inactive_customers": [1, 1]})
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True),
        expect.astype({"inactive_customers": "int64"}))


def test_large_order_totals_having_topk(ray_session):
    """Q18: per-order qty sums cross batches; HAVING strictly greater;
    top-k ordered (price desc, orderkey asc)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import large_order_totals

    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 20, 30], pa.int64()),
        "o_orderdate": pa.array(np.array(
            ["1996-01-01", "1996-01-02", "1996-01-03"],
            dtype="datetime64[us]")),
        "o_totalprice": pa.array([100.50, 200.25, 200.25],
                                 pa.float64()),
    }))
    # order 1: qty 5+5=10 (> 9 passes, > 10 fails); order 2: 12;
    # order 3: 3
    lineitem = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_quantity": pa.array([5.0, 5.0, 12.0, 3.0], pa.float64()),
    }))
    out = large_order_totals(orders, lineitem, qty_threshold=9,
                             k=10, n_partitions=2).to_pandas()
    assert list(out["o_orderkey"]) == [2, 1]   # price desc, key asc
    assert list(out["total_qty"]) == [12, 10]
    assert list(out["o_totalprice_c2"]) == [20025, 10050]
    # strict >: threshold 10 drops order 1
    out2 = large_order_totals(orders, lineitem, qty_threshold=10,
                              k=10, n_partitions=3).to_pandas()
    assert list(out2["o_orderkey"]) == [2]
    # k truncation
    out3 = large_order_totals(orders, lineitem, qty_threshold=1,
                              k=2, n_partitions=2).to_pandas()
    assert len(out3) == 2 and list(out3["o_orderkey"]) == [2, 3]


def test_quantity_moments_exact(ray_session):
    """Moments from int partials equal the direct computation and are
    partitioning-invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import quantity_moments

    rng = np.random.default_rng(7)
    q = rng.integers(1, 51, size=400).astype(np.float64)
    flags = np.where(rng.random(400) < 0.5, "A", "R")
    ds = ray.data.from_arrow(pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "l_linestatus": pa.array(["O"] * 400, pa.string()),
        "l_quantity": pa.array(q, pa.float64()),
    }))
    out = quantity_moments(ds).to_pandas()
    for _, row in out.iterrows():
        sel = q[flags == row["l_returnflag"]]
        assert row["n"] == len(sel)
        assert abs(row["mean_qty"] - sel.mean()) < 2e-6
        assert abs(row["var_pop_qty"] - sel.var()) < 2e-6
    out2 = quantity_moments(ds.repartition(7)).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_customer_order_distribution(ray_session):
    """Q13 outer-join distribution: zero bucket from the customer
    tally, excluded status dropped, partition invariance."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import customer_order_distribution

    customer = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    # cust 1: 3 orders; cust 2: 1; cust 3: only a 'P' order (-> 0);
    # custs 4,5: none.
    orders = ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "O", "O", "P"],
                                  pa.string()),
    }))
    out = customer_order_distribution(
        customer, orders, n_partitions=2).to_pandas() \
        .sort_values("c_count").reset_index(drop=True)
    assert out["c_count"].tolist() == [0, 1, 3]
    assert out["custdist"].tolist() == [3, 1, 1]
    out2 = customer_order_distribution(
        customer.repartition(3), orders.repartition(4),
        n_partitions=3).to_pandas() \
        .sort_values("c_count").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_top_returned_customers(ray_session):
    """Q10: returned-line revenue mapped through orders onto
    customers, exact cents, deterministic top-N."""
    import pandas as pd
    import pyarrow as pa
    import numpy as np
    import ray.data
    from readability_ray.functions import top_returned_customers

    customer = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"], pa.string()),
        "c_acctbal": pa.array([10.50, -3.25, 0.0], pa.float64()),
    }))
    dates = np.array(["1996-02-01", "1996-03-01", "1995-01-01"],
                     dtype="datetime64[us]")
    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        "o_orderdate": pa.array(dates),
    }))
    # order 100: two R lines; order 200: one R line; order 300 out of
    # window; one A line ignored.
    lineitem = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([100, 100, 200, 300, 100], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 5.0, 99.0, 7.0],
                                    pa.float64()),
        "l_discount": pa.array([0.10, 0.0, 0.05, 0.0, 0.0],
                               pa.float64()),
        "l_returnflag": pa.array(["R", "R", "R", "R", "A"],
                                 pa.string()),
    }))
    out = top_returned_customers(customer, orders, lineitem,
                                 n_partitions=2).to_pandas()
    # cust 1: 1000c*90 + 2000c*100 = 290000 c4; cust 2: 500*95=47500
    assert out["c_custkey"].tolist() == [1, 2]
    assert out["revenue_c4"].tolist() == [290000, 47500]
    assert out["c_acctbal_cents"].tolist() == [1050, -325]
    assert out["c_name"].tolist() == ["a", "b"]
    out2 = top_returned_customers(
        customer.repartition(2), orders.repartition(3),
        lineitem.repartition(4), n_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_quantity_price_correlation(ray_session):
    """Exact five-sum Pearson r vs numpy corrcoef at floor-6;
    partition invariance of the big-int partials."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import quantity_price_correlation

    q = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.float64)
    p = np.array([10.0, 19.5, 31.0, 42.25, 48.0, 61.5, 70.0, 82.5])
    ds = ray.data.from_arrow(pa.table({
        "l_quantity": pa.array(q), "l_extendedprice": pa.array(p)}))
    out = quantity_price_correlation(ds).to_pandas()
    expected = np.corrcoef(q, np.rint(p * 100))[0, 1]
    assert int(out.loc[0, "n"]) == 8
    assert abs(out.loc[0, "corr_qty_price"] - expected) < 2e-6
    out2 = quantity_price_correlation(ds.repartition(5)).to_pandas()
    assert out.equals(out2)


def test_quantity_price_correlation_bigint(ray_session):
    """Sum-of-squares past int64: huge prices still exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import quantity_price_correlation

    # per-element squares stay int64-exact (p_cents <= 1e7 -> p^2 <=
    # 1e14); the chunked big-sum protects the corpus-level SUM, which
    # is what overflows first at scale
    n = 3000
    p = np.full(n, 99_999.99)
    p[: n // 2] = 88_888.88
    q = np.ones(n)
    q[: n // 2] = 2.0
    ds = ray.data.from_arrow(pa.table({
        "l_quantity": pa.array(q), "l_extendedprice": pa.array(p)}))
    out = quantity_price_correlation(ds).to_pandas()
    # perfectly anti-correlated two-point distribution -> r = -1
    assert out.loc[0, "corr_qty_price"] == -1.0
    out2 = quantity_price_correlation(ds.repartition(7)).to_pandas()
    assert out.equals(out2)


def test_brand_quantity_revenue(ray_session):
    """Q19 disjunctive branches: per-branch masks, ANY counts
    overlapping lines once, zero-match branch emits a zero row."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import brand_quantity_revenue

    part = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["BA", "BB", "BC"], pa.string()),
    }))
    lineitem = ray.data.from_arrow(pa.table({
        "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_quantity": pa.array([5.0, 20.0, 12.0, 30.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 10.0, 20.0, 30.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
    }))
    # overlapping bands on BA and BB; BC band misses its only line
    branches = (("BA", 1, 15), ("BB", 10, 25), ("BA", 4, 6))
    out = brand_quantity_revenue(lineitem, part,
                                 branches=branches).to_pandas() \
        .set_index("branch")
    # BA 1-15 matches qty 5 (rev 100000 c4); BA 4-6 matches same line
    assert int(out.loc["ANY", "n_lines"]) == 2  # line1 once + BB line
    assert int(out.loc["ANY", "revenue_c4"]) == 100000 + 200000
    assert int(out.loc["BB", "n_lines"]) == 1
    out2 = brand_quantity_revenue(lineitem.repartition(3), part,
                                  branches=branches).to_pandas() \
        .set_index("branch")
    pd.testing.assert_frame_equal(out, out2)


def test_wealthy_inactive_customers(ray_session):
    """Q22: above-positive-average balance (exact cross-multiply),
    no orders; actives and below-average drop."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import wealthy_inactive_customers

    customer = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_mktsegment": pa.array(["A", "A", "B", "B", "B"],
                                 pa.string()),
        # positive balances: 10, 20, 30, 40 -> avg 25
        "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0, -5.0],
                              pa.float64()),
    }))
    # cust 4 (40 > 25) has an order -> active, drops; cust 3 (30 > 25)
    # inactive -> kept; 1, 2 below avg; 5 negative
    orders = ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([4, 4], pa.int64()),
    }))
    out = wealthy_inactive_customers(customer, orders,
                                     n_partitions=2).to_pandas()
    assert out["c_mktsegment"].tolist() == ["B"]
    assert out["numcust"].tolist() == [1]
    assert out["totacctbal_cents"].tolist() == [3000]
    out2 = wealthy_inactive_customers(
        customer.repartition(3), orders.repartition(2),
        n_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_top_supplier_revenue_argmax_ties(ray_session):
    """Q15 shape: window filter, exact fixed-point argmax, ties kept,
    names from the supplier broadcast; partition invariance."""
    import ray
    from readability_ray.functions import top_supplier_revenue
    li = pd.DataFrame({
        "l_suppkey": [1, 2, 2, 3, 1],
        "l_extendedprice": [100.00, 60.00, 40.00, 99.99, 50.00],
        "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(
            ["1996-01-05", "1996-02-01", "1996-03-01", "1996-01-01",
             "1999-01-01"]),  # last row outside the window
    })
    supp = pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["S1", "S2", "S3"]})
    out = top_supplier_revenue(_ds(ray, li), _ds(ray, supp)) \
        .to_pandas()
    # supplier 1: 100.00, supplier 2: 60+40 = 100.00 (tie), 3: 99.99
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["s_name"]) == ["S1", "S2"]
    assert list(out["total_revenue_c4"]) == [1000000, 1000000]
    out2 = top_supplier_revenue(
        _ds(ray, li).repartition(4), _ds(ray, supp),
        n_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_small_quantity_revenue_exact_predicate(ray_session):
    """Q17 shape: the 5·qty·cnt < Σqty integer predicate matches
    qty < 0.2·avg exactly; non-brand parts ignored; zero-qualifier
    corpus still yields the mandatory single row."""
    import ray
    from readability_ray.functions import small_quantity_revenue
    part = pd.DataFrame({
        "p_partkey": [1, 2],
        "p_brand": ["B#1", "B#2"]})
    # part 1 (brand B#1): quantities 1, 30, 30 -> avg 20.333,
    # threshold 4.066 -> only qty 1 qualifies (5*1*3=15 < 61)
    li = pd.DataFrame({
        "l_partkey": [1, 1, 1, 2],
        "l_quantity": [1.0, 30.0, 30.0, 1.0],
        "l_extendedprice": [10.00, 99.00, 99.00, 55.00]})
    out = small_quantity_revenue(
        _ds(ray, li), _ds(ray, part), brand="B#1").to_pandas()
    assert len(out) == 1
    assert int(out.loc[0, "total_price_c2"]) == 1000
    assert int(out.loc[0, "qualifying_lines"]) == 1
    # no qualifying lines at all -> still one (0, 0) row
    out0 = small_quantity_revenue(
        _ds(ray, li), _ds(ray, part), brand="B#3").to_pandas()
    assert len(out0) == 1
    assert int(out0.loc[0, "qualifying_lines"]) == 0
    out2 = small_quantity_revenue(
        _ds(ray, li).repartition(3), _ds(ray, part),
        brand="B#1", n_partitions=2).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_sole_return_suppliers_quantifiers(ray_session):
    """Q21 shape: EXISTS another supplier + NOT EXISTS another
    returned supplier, combiners mergeable across batch splits."""
    import ray
    from readability_ray.functions import sole_return_suppliers
    # order 10: supp 1 returned, supp 2 clean  -> supp 1 scores
    # order 20: supp 1 and supp 2 both returned -> nobody
    # order 30: supp 3 returned, sole supplier  -> nobody (nsupp=1)
    # order 40: supp 2 returned (two lines, split across batches),
    #           supp 3 clean -> supp 2 scores
    li = pd.DataFrame({
        "l_orderkey": [10, 10, 20, 20, 30, 40, 40, 40],
        "l_suppkey":  [1,  2,  1,  2,  3,  2,  2,  3],
        "l_returnflag": ["R", "N", "R", "R", "R", "R", "N", "A"]})
    supp = pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["S1", "S2", "S3"]})
    out = sole_return_suppliers(_ds(ray, li), _ds(ray, supp)) \
        .to_pandas()
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["numwait"]) == [1, 1]
    out2 = sole_return_suppliers(
        _ds(ray, li).repartition(5), _ds(ray, supp),
        n_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_nation_volume_shipping_pair_directions(ray_session):
    """Q7 shape: only cross-nation pair rows count, both directions
    reported, year split from shipdate; partition invariance."""
    import ray
    from readability_ray.functions import nation_volume_shipping
    nation = pd.DataFrame({
        "n_nationkey": [1, 2, 3],
        "n_name": ["NA", "NB", "NC"]})
    supplier = pd.DataFrame({
        "s_suppkey": [10, 11, 12],
        "s_nationkey": [1, 2, 3]})
    customer = pd.DataFrame({
        "c_custkey": [100, 101, 102],
        "c_nationkey": [2, 1, 3]})
    orders = pd.DataFrame({
        "o_orderkey": [1000, 1001, 1002],
        "o_custkey": [100, 101, 102]})
    li = pd.DataFrame({
        # NA supp -> NB cust (1996); NB supp -> NA cust (1997);
        # NA supp -> NA cust (same nation, dropped);
        # NC supp -> NC cust (not in pair, dropped)
        "l_orderkey": [1000, 1001, 1001, 1002],
        "l_suppkey": [10, 11, 10, 12],
        "l_extendedprice": [100.0, 200.0, 50.0, 75.0],
        "l_discount": [0.0, 0.1, 0.0, 0.0],
        "l_shipdate": pd.to_datetime(
            ["1996-05-01", "1997-02-01", "1997-03-01",
             "1996-01-01"])})
    out = nation_volume_shipping(
        _ds(ray, customer), _ds(ray, orders), _ds(ray, li),
        _ds(ray, supplier), _ds(ray, nation),
        nation_a="NA", nation_b="NB").to_pandas()
    got = {(r.supp_nation, r.cust_nation, r.l_year): r.revenue_c4
           for r in out.itertuples()}
    # NA->NA row must NOT be present (same nation dropped)
    assert ("NA", "NA", 1997) not in got
    assert got[("NA", "NB", 1996)] == 1000000
    assert got[("NB", "NA", 1997)] == 1800000
    assert len(got) == 2
    out2 = nation_volume_shipping(
        _ds(ray, customer).repartition(2), _ds(ray, orders),
        _ds(ray, li).repartition(3), _ds(ray, supplier),
        _ds(ray, nation), nation_a="NA", nation_b="NB",
        n_partitions=3).to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_nation_market_share_fraction(ray_session):
    """Q8 shape: typed lines only, region-restricted customers,
    exact integer numerator/denominator, floor-6 share."""
    import ray
    from readability_ray.functions import nation_market_share
    region = pd.DataFrame({
        "r_regionkey": [0, 1], "r_name": ["RX", "RY"]})
    nation = pd.DataFrame({
        "n_nationkey": [1, 2], "n_name": ["NA", "NB"],
        "n_regionkey": [0, 0]})
    supplier = pd.DataFrame({
        "s_suppkey": [10, 11], "s_nationkey": [1, 2]})
    customer = pd.DataFrame({
        "c_custkey": [100], "c_nationkey": [2]})
    orders = pd.DataFrame({
        "o_orderkey": [1000], "o_custkey": [100],
        "o_orderdate": pd.to_datetime(["1996-07-01"])})
    part = pd.DataFrame({
        "p_partkey": [1, 2], "p_type": ["T", "U"]})
    li = pd.DataFrame({
        # typed line by NA supp (counts in numerator), typed line by
        # NB supp (denominator only), untyped line (dropped)
        "l_orderkey": [1000, 1000, 1000],
        "l_suppkey": [10, 11, 10],
        "l_partkey": [1, 1, 2],
        "l_extendedprice": [100.0, 300.0, 999.0],
        "l_discount": [0.0, 0.0, 0.0]})
    out = nation_market_share(
        _ds(ray, customer), _ds(ray, orders), _ds(ray, li),
        _ds(ray, supplier), _ds(ray, nation), _ds(ray, region),
        _ds(ray, part), region_name="RX", nation_name="NA",
        type_name="T").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["o_year"]) == 1996
    assert int(r["nation_revenue_c4"]) == 1000000
    assert int(r["total_revenue_c4"]) == 4000000
    assert abs(r["mkt_share"] - 0.25) < 1e-9


def test_customer_cumulative_spend(ray_session):
    """Hand-checkable ledger: per-customer running totals in date
    then orderkey order, exact cents."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import customer_cumulative_spend
    day = np.int64(86_400_000_000)
    rows = [  # (okey, cust, day#, price)
        (1, 7, 0, 10.25), (2, 7, 1, 5.50), (3, 7, 1, 1.00),
        (4, 9, 0, 100.00)]
    ds = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            np.array([r[2] for r in rows], dtype=np.int64) * day,
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[3] for r in rows],
                                 pa.float64())}))
    out = customer_cumulative_spend(ds.repartition(3),
                                    n_partitions=2).to_pandas() \
        .set_index("o_orderkey")
    assert out.loc[1, "cum_spend_cents"] == 1025
    assert out.loc[2, "cum_spend_cents"] == 1575  # tie day: okey 2<3
    assert out.loc[3, "cum_spend_cents"] == 1675
    assert out.loc[4, "cum_spend_cents"] == 10000


def test_ship_lag_histogram(ray_session):
    """Hand-built orders/lineitem: exact day lags, counts merge."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import ship_lag_histogram
    day = np.int64(86_400_000_000)

    def ts(days):
        return pa.array(np.array(days, dtype=np.int64) * day,
                        pa.timestamp("us"))
    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": ts([0, 10])}))
    li = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "l_shipdate": ts([3, 5, 13, 13, 10])}))
    out = ship_lag_histogram(orders, li, n_partitions=2).to_pandas()
    got = dict(zip(out["lag_days"].astype(int),
                   out["n_items"].astype(int)))
    assert got == {0: 1, 3: 3, 5: 1}
    assert list(out["lag_days"]) == sorted(out["lag_days"])


def test_rfm_segments_hand_checked(ray_session):
    """9 customers engineered so each RFM dimension splits 3/3/3 at
    the terciles; every customer's segment triple is hand-derived."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data
    from readability_ray.functions import rfm_segments
    day = np.int64(86_400_000_000)
    rows = []  # (okey, cust, day, price)
    okey = 0
    # customer i (1..9): last order at day 100-i (r = i), i orders,
    # each order 10*i dollars (m = i*1000*i cents... keep simple:
    # one extra order per customer at varying count)
    for i in range(1, 10):
        for j in range(i):
            okey += 1
            rows.append((okey, i, 100 - i, float(10 * i)))
    ds = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            np.array([r[2] for r in rows], dtype=np.int64) * day,
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[3] for r in rows],
                                 pa.float64())}))
    out = rfm_segments(ds, n_partitions=2).to_pandas()
    # r values: 1..9 (days before max day 99); f: 1..9; m: i*i*1000
    # cents (monotone in i) -> every dimension's terciles split at
    # ranks ceil(9/3)=3 and ceil(18/3)=6 -> values 3 and 6.
    # customer i: seg = 1 if i<=3, 2 if i<=6 else 3 on r; f and m are
    # monotone in i too, BUT r is "days since last" so customer 1
    # (most recent) has r=1 -> r_seg 1 while f=1 -> f_seg 1.
    got = {(int(r.r_seg), int(r.f_seg), int(r.m_seg)):
           int(r.n_customers) for r in out.itertuples()}
    # r = i exactly, so r_seg == f_seg == m_seg for each customer
    assert got == {(1, 1, 1): 3, (2, 2, 2): 3, (3, 3, 3): 3}
