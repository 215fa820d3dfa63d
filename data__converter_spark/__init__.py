"""data__converter_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference app
``sizcaofray/data--converter`` (a browser-side file/data conversion SaaS)
as an idiomatic, cluster-scale Apache Spark engine, plus the
LLM-training-data pipeline operators (dedup, similarity search,
multimodal columns, text analysis) a 100 TB corpus pipeline needs.

Modules (see SURVEY.md §7):

- ``session``   — SparkSession factory (AQE on, tuned shuffle partitions)
- ``schema``    — key-union normalization, stringify-at-edge, flatten
- ``compare``   — keyed full-outer diff + field-level mismatch unpivot
- ``mask``      — declarative FieldRule -> Column masking compiler
- ``pattern``   — regex find/count/replace + preset transform library
- ``convert``   — format-conversion pipelines over the io readers/writers
- ``io``        — csv/tsv/txt/json/xml/excel/binary readers and writers
- ``llmops``    — dedup (exact/minhash/simhash), similarity search,
                  text analysis, multimodal column plumbing
- ``streaming`` — Structured Streaming windows/watermark/stateful ops
"""

__version__ = "0.1.0"
