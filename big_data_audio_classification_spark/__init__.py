"""big_data_audio_classification_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Miscellian/big-data-audio-classification`` (a single-node
audio-classification pipeline; see SURVEY.md), widened to the full
relational / LLM-data-pipeline operator surface mandated by BASELINE.json.

Design principles (100 TB first):

* Declare plans with the DataFrame / SQL API; let Catalyst + AQE pick the
  physical strategy (broadcast vs sort-merge joins, skew splitting,
  partition coalescing).
* Keep hot paths JVM-side (built-in ``pyspark.sql.functions``); drop to
  Arrow-batched pandas UDFs only where built-ins cannot express the
  semantics (audio decode, mel extraction, embedding math fallbacks).
* Every operator is a lazy DataFrame transformation — no ``collect()``
  driver loops inside operators; only sinks materialize.
"""

from big_data_audio_classification_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
