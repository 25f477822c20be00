"""page_rank_mapreduce_java_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
repo kokomocha/page-rank-mapreduce-java (a Hadoop MapReduce PageRank; see
SURVEY.md), extended with the relational operator surface and the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) a 100 TB training-data pipeline needs.

Design stance (SURVEY.md §7): DataFrame API end-to-end; Catalyst plans the
physical execution; no RDDs; Pandas UDFs only where built-ins genuinely
cannot express the semantics.
"""

from page_rank_mapreduce_java_spark.session import get_spark
from page_rank_mapreduce_java_spark.catalog import load_table, load_tables, register_views

__all__ = ["get_spark", "load_table", "load_tables", "register_views"]

__version__ = "0.1.0"
