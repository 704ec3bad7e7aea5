"""PySpark-native analytics engine with the query/data-processing surface of
kallenxuzy/DS-GA1004_BigData_Project (see SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, Kryo, shuffle sizing)
- ``sources``    : catalog/IO layer — Parquet/CSV readers, named view registration
- ``operators``  : relational / dedup / similarity / sampling / multimodal operators
- ``functions``  : scalar & text function library (JVM-side exprs, no Python UDFs)
- ``ml``         : recsys layer — StringIndexer paths, implicit ALS, ranking metrics
- ``streaming``  : event-time windowing & sessionization (batch + Structured Streaming)
- ``plans``      : physical-plan inspection helpers (pushdown/broadcast assertions)
- ``queries``    : the named query registry consumed by ``__spark_entry__.py``

Design stance (SURVEY.md §7.1): declare logical plans with the DataFrame/SQL API
and let Catalyst/Tungsten choose the physical strategy; zero custom Catalyst
rules; Python stays out of the hot path (no row-at-a-time UDFs).
"""

__version__ = "0.1.0"
