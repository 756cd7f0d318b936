"""nzgmdb_spark — a PySpark-native analytics engine.

A brand-new engine, built Spark-first, with the query and data-processing
capabilities of the ucgmsim/nzgmdb reference pipeline (see SURVEY.md):
relational operator library, signal-kernel pandas UDFs, geospatial joins,
declustering, streaming mode, plus large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Everything is expressed with the DataFrame / Spark SQL API so Catalyst
supplies planning and optimization; pandas UDFs (Arrow-vectorized) are used
only where built-in operators cannot express the semantics.
"""

__version__ = "0.1.0"
