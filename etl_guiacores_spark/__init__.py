"""etl_guiacores_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL
(Paniceres/etl-guiacores, surveyed in SURVEY.md), extended with
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
- ``session``    — SparkSession factory with deterministic config
- ``schema``     — canonical lead record StructType + N/A<->NULL codec
- ``functions``  — pure Column-expression cleaning/validation ops
- ``operators``  — DataFrame->DataFrame operators (dedupe, joins,
                   text stats, similarity, multimodal)
- ``sources``    — readers / generators (scans from SURVEY §2.1)
- ``plans``      — staged bronze/silver/gold pipeline runner
- ``streaming``  — Structured Streaming surface (SURVEY §2.10)
"""

__version__ = "0.1.0"
