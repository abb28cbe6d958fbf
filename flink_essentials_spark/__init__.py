"""flink_essentials_spark — a PySpark-native streaming/batch dataflow engine.

A brand-new engine with the query and data-processing capabilities of
the reference repo (RaccoonDev/flink-essentials: Flink DataStream API
essentials — event-time windows, watermarks, keyed state, triggers,
multi-stream joins), re-expressed Spark-first:

- batch & streaming DataFrames (Catalyst optimizes; we declare plans)
- Structured Streaming for unbounded data (watermarks, update mode,
  ``applyInPandasWithState`` for custom stateful operators)
- an extension layer for large-scale training-data pipelines
  (dedup, similarity search, text analysis, multimodal columns)

Public API is the :class:`Stream` fluent builder (dataflow), the
:class:`Corpus` fluent builder (LLM-data pipelines) plus the operator
modules. Everything is a thin, typed veneer over documented PySpark
DataFrame calls — no private Spark APIs, no RDD hot paths.
"""

from flink_essentials_spark.session import get_spark, stop_spark
from flink_essentials_spark.api import Stream
from flink_essentials_spark.corpus import Corpus
from flink_essentials_spark.tables import TABLE_NAMES, load_tables, register_views

__all__ = [
    "get_spark",
    "stop_spark",
    "Stream",
    "Corpus",
    "TABLE_NAMES",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
