"""khose_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of BigDataBoutique/khose (a stream-to-
cold-storage shipper: Kafka/Kinesis -> transform -> buffered batches ->
immutable Parquet/ORC) on top of Apache Spark, and extends it with the
relational + LLM-data-pipeline operator surface described in SURVEY.md §2.

Architecture: everything is a Spark DataFrame (batch) or streaming
DataFrame (ingest). No RDD API anywhere. Python logic only via
Arrow-vectorized pandas UDFs. See SURVEY.md §1.4.

NOTE on provenance: /root/reference is an empty checkout (SURVEY.md §0),
so no reference file:line citations are possible; docstrings cite
SURVEY.md / BASELINE.json instead.
"""

__version__ = "0.1.0"
