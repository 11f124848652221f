"""PySpark-native analytics engine with the query/data-processing
capabilities of aws-samples/flink-stream-processing-refarch.

Spark-first re-expression of the reference (a Flink 1.5 DataStream job +
Kinesis producer): the two continuous taxi queries (SURVEY.md §0), the full
scalar-function surface (§2.6), the generic relational operator suite Spark
provides natively (§2.7), and the large-scale training-data-pipeline
operators (dedup / similarity / multimodal / text analysis).

Everything is DataFrame/SQL-first: logical plans are declared with the
DataFrame API and Catalyst picks the physical strategy. UDFs appear only
where built-ins genuinely cannot express the semantics (and then as
Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
