"""awi_datapipelinepublic_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline tamidodo/AWI_DataPipelinePublic (clean → load → time-window
merge → analytical views; see SURVEY.md) as an idiomatic PySpark
engine: DataFrame/SQL declarative plans optimized by Catalyst, plus
scale-path extensions a large training-data pipeline needs
(deduplication, similarity search, text analysis, event windowing).

Design stance (SURVEY.md §7):
- DataFrame, not RDD; expressions stay JVM-side in whole-stage codegen.
- Dimension joins are broadcast; fact-fact joins are shuffle joins
  managed by AQE.
- The only stateful engine code is the time-window merge writer
  (reference config.py:180-212 semantics) — everything else is a pure
  logical-plan builder.
"""

from awi_datapipelinepublic_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
