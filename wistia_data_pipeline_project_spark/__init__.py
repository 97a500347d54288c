"""wistia_data_pipeline_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline ``dhyeu/wistia-data-pipeline-project``
(paginated REST ingestion -> projection/filter/dedup -> broadcast-join
enrichment -> grouped aggregation with a stateful watch-time fold ->
incremental star-schema loads), built Spark-first: declared schemas,
DataFrame/SQL logical plans optimized by Catalyst, window functions for
the stateful operator, partitioned Parquet sinks, and a Structured
Streaming variant. Extended with large-scale pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.

Layout:
- ``session``    : SparkSession factory (UTC, AQE, local-tuned shuffle).
- ``schemas``    : declared StructTypes for the Wistia shapes & driver tables.
- ``sources``    : parquet/JSON readers, latest-run discovery, REST source.
- ``operators``  : dim/visitor/fact transforms, watch-time, dedup,
                   similarity, text analysis, multimodal, incremental loads.
- ``plans``      : the query catalog backing ``__spark_entry__.py``.
- ``functions``  : reusable Column-expression helpers.
- ``streaming``  : Structured Streaming variant of the incremental rollup.
"""

__version__ = "0.1.0"
