"""blspark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
pipeline (`ubaidullaah/aws-data-pipeline-bls-population-data-pipeline-`,
see SURVEY.md) as idiomatic Spark: DataFrame/SQL on Catalyst, Structured
Streaming for file-arrival triggers, and large-scale extension operators
(dedup, similarity search, text analysis) designed for 100 TB inputs.
"""

from blspark.session import get_spark

__all__ = ["get_spark"]
