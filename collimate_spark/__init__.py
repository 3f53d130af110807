"""collimate_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``dataship/collimate`` (reference: /root/reference/index.js): typed columnar
ingestion (CSV/TSV/JSON → Parquet) plus the full relational query surface
over the resulting store, streaming ingestion, and large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design rules (100 TB-scale):
- declarative DataFrame/SQL plans; Catalyst picks physical strategy
- no driver-side materialization of data (the reference's readFileSync
  anti-pattern, index.js:552, is exactly what we do NOT do)
- built-in JVM expressions over Python UDFs; Arrow-batched pandas UDFs
  only where built-ins cannot express the semantics
- broadcast small dims, AQE on, bounded sampling for inference
"""

from collimate_spark.session import get_session
from collimate_spark.catalog import load_table, load_tables, TABLES

__all__ = ["get_session", "load_table", "load_tables", "TABLES"]
__version__ = "0.1.0"
