"""Large-scale training-data-pipeline operators: dedup, similarity search,
text analysis, multimodal column plumbing.

These extend the reference's migration surface with the operations a 100 TB
data pipeline needs (BASELINE.json north star). All hot paths are built-in
column expressions (JVM, codegen); Python appears only in Arrow-batched
pandas UDFs where semantics require it.
"""
