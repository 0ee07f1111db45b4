"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `pesto93/Clickhouse_data-rebalance` repo
(a ClickHouse shard-rebalance tool), rebuilt Spark-first.

Blueprint: /root/repo/SURVEY.md. The reference's surface (catalog
introspection, DDL versioning, online table swap, hash re-shard bulk
move — sharding_recreation.py:44-342) maps to `plans/` (catalog +
rebalance); the implied server-side semantics (distributed union-all
read, hash scatter, schema-preserving copy) plus the north-star
relational / LLM-pipeline / streaming surface live in `operators/`,
`functions/`, and `streaming/`.

Public API:
    from clickhouse_data_rebalance_spark import registry
    registry.load_all()          # imports every operator module
    registry.QUERIES             # name -> (spark, sf_dir) -> DataFrame
    registry.ORACLES             # name -> equivalent DuckDB SQL
"""

__version__ = "0.1.0"
