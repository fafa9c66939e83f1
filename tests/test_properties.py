"""Property-based tests (SURVEY §5.3): operator algebra laws over
hypothesis-generated small tables on local Spark.

Each law is engine-agnostic — it must hold for ANY correct relational
engine, so a violation is an engine bug, not a fixture artifact:
* dedup idempotence:        dd(dd(X)) == dd(X)
* union-count algebra:      |A ∪all B| == |A| + |B|
* inclusion-exclusion:      |A ∪ B| == |A| + |B| − |A ∩ B|  (set form)
* window-sum consistency:   last running sum per key == group sum
* join cardinality bounds:  |A ⋈ B on k| ≤ |A|·|B|; semi ≤ |A|; inner
                            with unique right key ≤ |A|
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),           # key
        st.integers(min_value=-100, max_value=100),      # value
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@given(rows=ROWS)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates()
    assert once.count() == once.dropDuplicates().count()
    assert once.count() == len(set(rows))


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_union_all_counts(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionAll(db).count() == len(a) + len(b)


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_inclusion_exclusion(spark, a, b):
    da, db = _df(spark, a).distinct(), _df(spark, b).distinct()
    union = da.union(db).distinct().count()
    inter = da.intersect(db).count()
    assert union == da.count() + db.count() - inter


@given(rows=ROWS)
@SETTINGS
def test_running_sum_matches_group_sum(spark, rows):
    df = _df(spark, rows).withColumn("rid", F.monotonically_increasing_id())
    w = Window.partitionBy("k").orderBy("rid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = df.select("k", F.sum("v").over(w).alias("run"))
    final = cum.groupBy("k").agg(F.max("run").alias("max_run"))
    # max of running sum ≥ total only when negatives exist; compare the
    # LAST running value instead: count rows where run == group total
    direct = df.groupBy("k").agg(F.sum("v").alias("total"))
    # every group's final (by rid) running value equals the group total
    last_run = (
        df.select("k", "rid", "v")
        .withColumn("run", F.sum("v").over(w))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.col("rid").desc())),
        )
        .filter(F.col("rn") == 1)
        .select("k", "run")
    )
    joined = last_run.join(direct, "k")
    assert joined.filter(F.col("run") != F.col("total")).count() == 0
    assert final.count() == direct.count()


@given(a=ROWS, b=ROWS)
@SETTINGS
def test_join_cardinality_bounds(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    n_inner = da.join(db, "k").count()
    assert n_inner <= max(len(a), 1) * max(len(b), 1)
    n_semi = da.join(db, "k", "left_semi").count()
    assert n_semi <= len(a)
    # inner join against a unique-key right side never multiplies
    db_unique = db.dropDuplicates(["k"])
    assert da.join(db_unique, "k").count() <= len(a)
    # left join preserves left cardinality with unique right key
    assert da.join(db_unique, "k", "left").count() == len(a)
