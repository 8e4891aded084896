"""full_data_infrastructure_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference platform ``yanggautier/Full_Data_Infrastructure``
(an HR sports-benefit pipeline: Postgres + Debezium CDC + Kafka + Spark +
Delta + Trino + Great Expectations), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis) a
100 TB training-data pipeline needs.

Design principles (see SURVEY.md):

* Declare logical plans with the DataFrame/SQL API; let Catalyst pick the
  physical strategy (predicate pushdown, column pruning, broadcast joins).
* One lazy chain per job — no eager ``.count()``/``.show()`` staging like the
  reference's ``read_delta.py``.
* Shuffles are budgeted: dimension joins broadcast, aggregations pre-combine
  map-side, AQE handles skew and partition coalescing at runtime.
* Python stays out of the hot path: built-in ``pyspark.sql.functions``
  everywhere; Arrow-batched pandas UDFs only where semantics require them
  (external enrichment, multimodal decode).
"""

from full_data_infrastructure_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
