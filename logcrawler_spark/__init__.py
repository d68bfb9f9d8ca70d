"""logcrawler_spark — a PySpark-native URL-frontier & fetch-scheduler engine.

A brand-new engine (NOT a port) with the data-processing capabilities of
BerlinUnited/logcrawler re-realized as idiomatic Spark DataFrame/SQL over
snapshot-committed parquet tables (Iceberg analog — see ``catalog.py``):

- SURT canonicalization + xxhash64 URL keys (``functions.urls``)
- exact + Bloom-prefiltered URL-seen dedup (``operators.dedup``, ``plans.bloom``)
- per-host politeness budgets via event-time windows (``operators.politeness``)
- robots rules as a broadcast-joined table (``plans.frontier``)
- priority frontier with MERGE-INTO semantics + checkpoints (``catalog``,
  ``streaming.checkpoints``)
- vectorized pandas/Arrow extraction UDFs, byte-identical per URL
  (``extraction``)
- a reference-semantics operator pack (as-of join, carry-forward fill,
  top-1-per-group, reconciliation anti-join, …) in ``operators/``

Design blueprint with file:line citations of the reference: ``SURVEY.md``.
"""

__version__ = "0.1.0"
