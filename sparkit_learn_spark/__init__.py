"""sparkit_learn_spark — a PySpark-native analytics/ML engine.

A from-scratch, DataFrame-first re-expression of the capabilities of
lensacom/sparkit-learn (blocked-RDD distributed scikit-learn, see
SURVEY.md §2A), extended with the relational, streaming and
LLM-data-pipeline operator inventory of SURVEY.md §2B.

Design rules (SURVEY.md §4):
  * Declare plans with DataFrame/SQL; let Catalyst + AQE optimize.
  * Python crosses the JVM boundary only through Arrow (pandas_udf /
    mapInPandas / applyInPandas) — the modern equivalent of the
    reference's blocked-RDD boundary.
  * No unbounded collect() to the driver; broadcast only under
    threshold; aggregation stays distributed.

Caller contract for cached state (r12, after ADVICE r11): some query
functions persist() bounded intermediates or localCheckpoint()
iterative state for the duration of the returned plan's consumers —
deliberately WITHOUT a matching unpersist, because the frame is still
lazily referenced by the returned DataFrame. A long-lived session that
invokes query functions repeatedly should release that state between
invocations (``spark.catalog.clearCache()`` plus a blocking
``rdd.unpersist(True)`` over ``getPersistentRDDs()``), exactly as
``bench.py:_release_query_state`` and ``tools/profile_query.py`` do.
"""

__version__ = "0.1.0"
