"""Observation API: single-pass runtime QC metrics.

At 100 TB you cannot afford a second scan just to count rows or audit
value ranges of a pipeline stage — `df.observe(...)` piggybacks
aggregate metrics onto the SAME job that produces the output. These
tests pin that the observed metrics equal a separately-computed
aggregate, i.e. the piggyback is exact, on both a plain scan and a
registered contract query.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F
from pyspark.sql import Observation

from big_data_audio_classification_spark.operators.dedup import dedup_exact_hash
from big_data_audio_classification_spark.sources.catalog import load_table


@pytest.fixture()
def obs_spark(spark):
    """Isolated session for Observation tests: registering an
    Observation leaves a non-serializable ObservationManager in the
    session state that a LATER task closure (an MLlib fit elsewhere in
    the suite) can capture → ``Task not serializable``. newSession()
    shares the SparkContext but gets its own session state, so the
    observation never leaks into the shared session."""
    return spark.newSession()


def test_observe_metrics_match_direct_aggregates(obs_spark, sf_dir):
    o = load_table(obs_spark, sf_dir, "orders")
    obs = Observation("orders_qc")
    # NB: DISTINCT aggregates are rejected in observed metrics
    # (INVALID_OBSERVED_METRICS) — use approx_count_distinct there.
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("sum_price"),
        F.min("o_orderdate").alias("min_date"),
        F.approx_count_distinct("o_orderstatus").alias("n_status_approx"),
    ]
    observed = o.observe(obs, *metrics)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = o.agg(*metrics).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert abs(got["sum_price"] - direct["sum_price"]) < 1e-6
    assert got["min_date"] == direct["min_date"]
    assert got["n_status_approx"] == direct["n_status_approx"]


def test_observe_piggybacks_on_contract_query(obs_spark, sf_dir):
    """Attach QC metrics to a registered query's output without a
    second scan: observed row count must equal the query's count."""
    df = dedup_exact_hash(obs_spark, sf_dir)
    obs = Observation("dedup_qc")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_out"))
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["n_out"] == df.count()


def test_fd_and_ind_panels_match_pandas(spark, sf_dir):
    """FD violations and IND coverage must equal pandas replays, and
    the known-true dependencies must hold."""
    import pandas as pd

    from big_data_audio_classification_spark.operators.profiling import (
        profile_functional_dependencies,
        profile_inclusion_dependencies,
    )

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")

    fds = {r.fd: r for r in profile_functional_dependencies(spark, sf_dir).collect()}
    assert fds["o_orderkey->o_custkey"].holds
    assert fds["c_custkey->c_mktsegment"].holds
    viol = (o.groupby("o_custkey")["o_orderpriority"].nunique() > 1).sum()
    assert fds["o_custkey->o_orderpriority"].n_violating == viol
    nviol = (c.groupby("c_nationkey")["c_mktsegment"].nunique() > 1).sum()
    assert fds["c_nationkey->c_mktsegment"].n_violating == nviol

    inds = {r.ind: r for r in profile_inclusion_dependencies(spark, sf_dir).collect()}
    assert inds["orders.o_custkey<=customer.c_custkey"].holds
    assert inds["lineitem.l_orderkey<=orders.o_orderkey"].holds
    missing = len(set(c["c_custkey"]) - set(o["o_custkey"]))
    r = inds["customer.c_custkey<=orders.o_custkey"]
    assert r.n_missing == missing
    assert r.holds == (missing == 0)
