"""Large-scale training-data operators over the documents/embeddings tables.

Each operator is Spark-first (built-in pyspark.sql.functions, JVM-side,
whole-stage-codegen friendly) and has a DuckDB-oracle twin in
``__spark_entry__.oracle_sql`` so the driver's correctness gate can verify
values, not just row counts.
"""
