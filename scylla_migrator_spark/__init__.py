"""scylla_migrator_spark — a PySpark-native migration + validation engine.

A from-scratch re-expression of the capabilities of scylladb/scylla-migrator
(reference surveyed in SURVEY.md) as an idiomatic PySpark library:

* config-driven migration pipelines (read -> project/rename/filter -> write)
* a distributed validation engine (join-diff with typed tolerances + repair)
* per-cell TTL/WRITETIME metadata pipeline incl. the signature row-explosion
* a DynamoDB-item variant data model with canonical JSON codec
* streaming CDC replication (Structured Streaming, foreachBatch upsert)
* resumable savepoints as pruned work lists
* large-scale analytics extensions: dedup, similarity search, text analysis,
  multimodal column plumbing

Everything is DataFrame-first: plans are declared with pyspark.sql so Catalyst
handles pushdown/pruning/join strategy; Python touches rows only in
Arrow-batched pandas UDFs at the edges.
"""

__version__ = "0.1.0"

from scylla_migrator_spark.session import get_spark, load_tables  # noqa: F401
