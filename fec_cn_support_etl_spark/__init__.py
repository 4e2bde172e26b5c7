"""fec_cn_support_etl_spark — a PySpark-native analytics + CDC-ingest engine.

Built from scratch with the query/data-processing capabilities of the
reference repo shriyanyamali/fec-cn-support-etl (a single-process pandas
ETL over US FEC campaign-finance bulk files), re-expressed Spark-first:

- Layer 1 (``operators/``, ``sources/``, ``functions/``, ``plans/``): the
  reference's full operator inventory (SURVEY.md §2) as composable
  DataFrame transformations that Catalyst can optimize end-to-end.
- Layer 2 (``cdc/``, ``streaming/``): the generalized CDC / incremental
  ingest engine (WAL tail -> lake upsert, last-writer-wins dedup,
  schema evolution, exactly-once commit manifest, skew-aware
  partitioning) per BASELINE.json's north rule.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo read at /root/reference.
"""

__version__ = "0.1.0"
