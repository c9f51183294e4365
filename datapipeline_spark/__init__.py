"""datapipeline_spark — a PySpark-native temporal dataset/analytics engine.

A from-scratch reimplementation of the *semantics* of the reference
iterator-runtime (mr-lovalova/datapipeline, surveyed in SURVEY.md) on top of
the Spark DataFrame/SQL engine: declarative plans, Catalyst optimization,
distributed shuffle/sort, plus large-scale training-data operators
(dedup, similarity search, text analysis) the reference lacks.

Design stance (SURVEY.md §7): reimplement semantics, not mechanics.
DataFrames + Window + built-in joins replace the reference's iterator
runtime, external merge sort and alignment engine wholesale.
"""

__version__ = "0.1.0"
