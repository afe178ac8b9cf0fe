"""Skew/co-location contracts: salted ops return identical results to
their naive twins, and bucketed joins plan without an Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_text_classification_spark.operators.skew import (
    bucketed_join,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from pyspark_text_classification_spark.plans.explain import formatted_plan
from pyspark_text_classification_spark.sources.parquet import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, r.qty, r.mx)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.n, r.qty, r.mx)
        for r in salted_aggregate(
            li,
            ["l_returnflag", "l_linestatus"],
            {"n": "count(*)", "qty": "sum(l_quantity)", "mx": "max(l_extendedprice)"},
            salt=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plain = orders.join(cust, "custkey").count()
    salted = salted_join(orders, cust, "custkey", salt=8).count()
    assert plain == salted
    # inner-join row multiplicity survives salting
    plain_per_seg = {
        r.c_mktsegment: r.n
        for r in orders.join(cust, "custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    salted_per_seg = {
        r.c_mktsegment: r.n
        for r in salted_join(orders, cust, "custkey", salt=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert plain_per_seg == salted_per_seg


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    write_bucketed(li.select("orderkey", "l_quantity"), "b_lineitem", "orderkey")
    write_bucketed(orders.select("orderkey", "o_totalprice"), "b_orders", "orderkey")
    joined = bucketed_join(spark, "b_lineitem", "b_orders", "orderkey")
    plan = formatted_plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert joined.count() == li.join(orders, "orderkey").count()
