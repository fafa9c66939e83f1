"""Model lifecycle + layout operators (SURVEY §2.A R20, R29/R33, R34,
R38–R42, R48/R49): transpose, class inventory, seeded permutation,
row-id (non-positional) alignment, and the full fit→save→load→infer
pipeline with per-class probability columns and label decode.

Reference mapping (file:line into /root/reference):
* R20 transpose — ``audio_data.T`` (voice_classifier.py:115-116) →
  unpivot (long) + groupBy().pivot() (wide): the general distributed
  transpose; the audio path avoids it by emitting frames-as-rows.
* R29/R33 class inventory — ``unique().tolist()`` / ``len(np.unique)``
  (voice_classifier.py:184,193) → sort_array(collect_set()) +
  countDistinct.
* R34 permutation — ``np.random.permutation`` (voice_classifier.py:194-196)
  → ``orderBy(rand(seed))``; content-preserving (the oracle checks the
  multiset), determinism per-seed asserted in tests.
* R41 positional re-attach — ``reset_index`` alignment
  (voice_classifier.py:297-300) → explicit row-id join: positional
  alignment is undefined under distribution, a row_number key makes the
  alignment an equi-join.
* R27 projection+rename — ``[Time, mic, speaker]``→``X``
  (voice_classifier.py:166-167) → ``select(col.alias())`` as used
  throughout (exemplified here by the row-id join's projections).
* R38/R39 save/load — TF SavedModel dir (voice_classifier.py:272-281,291)
  → ``PipelineModel.write().save()`` / ``PipelineModel.load()``.
* R40 per-class probability columns (voice_classifier.py:293-294) →
  ``vector_to_array("probability")[i]`` aliased per class name.
* R42 inverse label transform (voice_classifier.py:301-304) →
  ``IndexToString(labels=fitted_labels)``.
* R48/R49 pipeline orchestration / inference entry
  (voice_classifier.py:45-62,64-71) → one ``pyspark.ml.Pipeline`` fit,
  persisted, reloaded, transformed.

Scale notes: pivot with an explicit value list is one shuffle (no
two-phase distinct-discovery pass); collect_set of class labels is a
tiny agg (class cardinality ≪ data); the saved PipelineModel is
driver-side metadata + small coefficient blobs — executors never hold
more than k×dim weights.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from big_data_audio_classification_spark.functions.vector import to_double
from big_data_audio_classification_spark.registry import query
from big_data_audio_classification_spark.sources.catalog import load_table

# process-unique: concurrent gate/test runs must not clash on the
# saved-model directory (overwrite-during-load is a transient corruption)
from big_data_audio_classification_spark.scratch import SCRATCH_DIR as _SCRATCH
N_DIMS = 4


def _dims(em: DataFrame) -> DataFrame:
    return em.select(
        "vec_id",
        "label",
        *[
            F.element_at(to_double(F.col("embedding")), i + 1).alias(f"x{i}")
            for i in range(N_DIMS)
        ],
    )


@query(
    "ml_transpose_long_wide",
    oracle="""
        SELECT vec_id,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS x0,
               ROUND(CAST(embedding[2] AS DOUBLE), 6) AS x1,
               ROUND(CAST(embedding[3] AS DOUBLE), 6) AS x2,
               ROUND(CAST(embedding[4] AS DOUBLE), 6) AS x3
        FROM embeddings
        WHERE vec_id < 200
    """,
    tags=("ml", "transpose", "pivot"),
)
def ml_transpose_long_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20: general transpose = unpivot to (id, dim, value) long form,
    then groupBy().pivot(explicit values) back to wide. The explicit
    value list keeps pivot to ONE shuffle (no distinct-discovery job).
    Round-trips the first 4 embedding dims; the oracle checks the wide
    result directly."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    long = _dims(em).unpivot(
        ids=["vec_id"],
        values=[f"x{i}" for i in range(N_DIMS)],
        variableColumnName="dim",
        valueColumnName="v",
    )
    return (
        long.groupBy("vec_id")
        .pivot("dim", [f"x{i}" for i in range(N_DIMS)])
        .agg(F.first("v"))
        .select(
            "vec_id", *[F.round(F.col(f"x{i}"), 6).alias(f"x{i}") for i in range(N_DIMS)]
        )
    )


@query(
    "ml_distinct_classes",
    oracle="""
        SELECT array_to_string(list_sort(list(DISTINCT label)), ',') AS classes,
               COUNT(DISTINCT label)                                 AS n_classes
        FROM embeddings
    """,
    tags=("ml", "encoding"),
)
def ml_distinct_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R29+R33: distinct class values as a sorted list + count
    (``unique().tolist()`` / ``len(np.unique)``). collect_set is safe
    here by contract: class cardinality is tiny. The list is serialized
    with array_join because the driver's pandas canonicalizer cannot
    hash raw array cells."""
    em = load_table(spark, sf_dir, "embeddings")
    return em.agg(
        F.array_join(F.sort_array(F.collect_set("label")), ",").alias("classes"),
        F.countDistinct("label").alias("n_classes"),
    )


@query(
    "ml_shuffle_permutation",
    oracle="SELECT vec_id, label FROM embeddings",
    tags=("ml", "shuffle"),
)
def ml_shuffle_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R34: seeded random permutation via ``orderBy(rand(seed))`` — a
    range-partitioned global sort on a uniform random key. Content is
    permutation-invariant (what the oracle checks); per-seed determinism
    is asserted in tests. MLlib fits don't need pre-shuffling (the
    reference's permutation is a Keras-ism) — this is layout machinery."""
    em = load_table(spark, sf_dir, "embeddings")
    return em.orderBy(F.rand(42)).select("vec_id", "label")


@query(
    "ml_rowid_positional_join",
    oracle="""
        WITH a AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS rid,
                          CAST(embedding[1] AS DOUBLE) AS x
                   FROM embeddings),
             b AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS rid, label
                   FROM embeddings)
        SELECT a.rid, ROUND(a.x, 6) AS x, b.label
        FROM a JOIN b ON a.rid = b.rid
    """,
    tags=("ml", "join", "alignment"),
)
def ml_rowid_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R41: the reference re-attaches prediction columns POSITIONALLY
    (``reset_index``, voice_classifier.py:297-300) — undefined under
    distribution. The engine form: mint an explicit row id with
    row_number over a total order, align by equi-join. (R27's
    projection+rename pattern is the two ``select(alias)`` legs.)"""
    em = load_table(spark, sf_dir, "embeddings")
    w = Window.orderBy("vec_id")
    a = em.select(
        F.row_number().over(w).alias("rid"),
        F.round(F.element_at(to_double(F.col("embedding")), 1), 6).alias("x"),
    )
    b = em.select(F.row_number().over(w).alias("rid"), "label")
    return a.join(b, "rid").select("rid", "x", "label")


@query("ml_pipeline_save_load", oracle=None, tags=("ml", "train", "persist", "mllib"))
def ml_pipeline_save_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R30+R38+R39+R40+R42+R48+R49: the full model lifecycle as ONE
    ``pyspark.ml.Pipeline``:

    VectorAssembler (R30) → StringIndexer(alphabetAsc, R28) → MLP
    (R35/R36 stand-in) — fit (R48), ``write().save()`` (R38),
    ``PipelineModel.load()`` (R39), ``transform`` on the holdout (R49),
    then per-class probability columns named by class (R40) and
    IndexToString label decode (R42), sorted by vec_id (R43).

    Rows-only: iterative seeded training isn't SQL-expressible; the
    lifecycle invariants (saved==loaded predictions, probs sum to 1,
    decode inverts encode) are asserted in tests/test_ml_inference.py.
    """
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import IndexToString, StringIndexer, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    em = _dims(load_table(spark, sf_dir, "embeddings")).withColumn(
        "class_name", F.concat(F.lit("cls_"), F.col("label"))
    )
    train, test = em.randomSplit([0.8, 0.2], seed=42)
    n_classes = em.select("class_name").distinct().count()  # R33

    # handleInvalid="skip": a class present only in the holdout must not
    # crash transform-time (the indexer is fit on the 80% split only).
    indexer = StringIndexer(
        inputCol="class_name", outputCol="y",
        stringOrderType="alphabetAsc", handleInvalid="skip",
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=[f"x{i}" for i in range(N_DIMS)], outputCol="features"
            ),
            indexer,
            MultilayerPerceptronClassifier(
                featuresCol="features", labelCol="y",
                layers=[N_DIMS, 16, n_classes], maxIter=40, seed=42, blockSize=64,
            ),
        ]
    )
    model = pipe.fit(train)
    path = os.path.join(_SCRATCH, "ml_pipeline_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)

    labels = reloaded.stages[1].labelsArray[0]  # fitted StringIndexer inventory
    preds = reloaded.transform(test)
    decoded = IndexToString(
        inputCol="prediction", outputCol="pred_class", labels=list(labels)
    ).transform(preds)
    prob = vector_to_array("probability")
    return decoded.select(
        "vec_id",
        "class_name",
        "pred_class",
        *[F.round(prob[i], 4).alias(f"p_{name}") for i, name in enumerate(labels)],
    ).orderBy("vec_id")


# --- round-7: the SQL-oracled half of the model-persistence surface -----

_PIPE_META_N_CLASSES = 10  # labels 0..9 by the generator's construction


@query(
    "ml_pipeline_metadata_contract",
    oracle=f"""
        SELECT * FROM (VALUES
            (0, 'VectorAssembler', 'n_input_cols', '{N_DIMS}'),
            (0, 'VectorAssembler', 'output_col', 'features'),
            (1, 'StringIndexerModel', 'order_type', 'alphabetAsc'),
            (1, 'StringIndexerModel', 'handle_invalid', 'skip'),
            (1, 'StringIndexerModel', 'n_labels', '{_PIPE_META_N_CLASSES}'),
            (1, 'StringIndexerModel', 'first_label', 'cls_0'),
            (2, 'MultilayerPerceptronClassificationModel', 'layers',
             '{N_DIMS},16,{_PIPE_META_N_CLASSES}'),
            (2, 'MultilayerPerceptronClassificationModel', 'max_iter', '40'),
            (2, 'MultilayerPerceptronClassificationModel', 'seed', '42'),
            (2, 'MultilayerPerceptronClassificationModel', 'n_weights',
             '{(N_DIMS + 1) * 16 + (16 + 1) * _PIPE_META_N_CLASSES}')
        ) AS t(stage_idx, stage_class, param, value)
    """,
    tags=("ml", "persist", "mllib", "report"),
)
def ml_pipeline_metadata_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-ORACLED half of the R38/R39 persistence surface: fit the
    ``ml_pipeline_save_load`` pipeline, ``save()`` it, ``load()`` it,
    and read the CONTRACT back OUT OF THE RELOADED MODEL — stage
    classes and order, assembler arity and output column, the fitted
    indexer's order type / invalid policy / label inventory, the MLP's
    layer spec, iteration budget, seed, and fitted weight-vector
    length. Every row is determined by construction (labels cls_0..9
    exist at every SF and alphabetAsc fixes their order), so the
    oracle is the literal expected table — if (de)serialization
    dropped or mutated ANY of it, the Spark side diverges and the
    hash goes red. The non-SQL-expressible half (iterative training,
    prediction values) stays rows-only in ``ml_pipeline_save_load``,
    with its invariants pytest-asserted — the split VERDICT r06 item
    7 asked for."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    em = _dims(load_table(spark, sf_dir, "embeddings")).withColumn(
        "class_name", F.concat(F.lit("cls_"), F.col("label"))
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=[f"x{i}" for i in range(N_DIMS)], outputCol="features"
            ),
            StringIndexer(
                inputCol="class_name", outputCol="y",
                stringOrderType="alphabetAsc", handleInvalid="skip",
            ),
            MultilayerPerceptronClassifier(
                featuresCol="features", labelCol="y",
                layers=[N_DIMS, 16, _PIPE_META_N_CLASSES],
                maxIter=40, seed=42, blockSize=64,
            ),
        ]
    )
    model = pipe.fit(em)
    path = os.path.join(_SCRATCH, "ml_pipeline_metadata_contract")
    model.write().overwrite().save(path)
    m = PipelineModel.load(path)

    asm, idx, mlp = m.stages
    rows = [
        (0, type(asm).__name__, "n_input_cols", str(len(asm.getInputCols()))),
        (0, type(asm).__name__, "output_col", asm.getOutputCol()),
        (1, type(idx).__name__, "order_type", idx.getStringOrderType()),
        (1, type(idx).__name__, "handle_invalid", idx.getHandleInvalid()),
        (1, type(idx).__name__, "n_labels", str(len(idx.labelsArray[0]))),
        (1, type(idx).__name__, "first_label", idx.labelsArray[0][0]),
        (2, type(mlp).__name__, "layers",
         ",".join(str(x) for x in mlp.getLayers())),
        (2, type(mlp).__name__, "max_iter", str(mlp.getMaxIter())),
        (2, type(mlp).__name__, "seed", str(mlp.getSeed())),
        (2, type(mlp).__name__, "n_weights", str(mlp.weights.size)),
    ]
    return spark.createDataFrame(
        rows, "stage_idx int, stage_class string, param string, value string"
    )
