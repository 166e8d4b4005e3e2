"""cqlcopy_spark — a PySpark-native analytics engine with the data-movement
capabilities of riptl/cqlcopy plus a full relational / LLM-data-pipeline
operator surface (SURVEY.md §2).

Design: everything is declared through the DataFrame / SQL API so Catalyst
owns optimization (pushdown, pruning, join strategy, AQE). Python UDFs are
confined to Arrow-batched pandas UDFs in the few operators whose semantics
Spark's built-ins cannot express (see operators/similarity.py and
operators/multimodal.py).
"""

from cqlcopy_spark.session import get_spark, session_builder

__all__ = ["get_spark", "session_builder"]
__version__ = "0.1.0"
