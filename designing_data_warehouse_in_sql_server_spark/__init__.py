"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference warehouse
(`iamziabutt/Designing-Data-Warehouse-In-SQL-Server`, surveyed in SURVEY.md).

Brand-new, Spark-first design: DataFrame/SQL declarative plans, Catalyst
optimization, broadcast joins for dimensions, parquet-backed managed tables
with join-based MERGE emulation (Delta is unavailable in this environment),
plus scale extensions (text dedup, similarity search, text analysis,
multimodal plumbing) for 100 TB training-data pipelines.
"""

__version__ = "0.1.0"
