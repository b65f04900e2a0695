"""hoover_snoop2_spark — a from-scratch PySpark-native re-expression of the
document-processing core of liquidinvestigations/hoover-snoop2.

The reference (studied at /root/reference) is a Celery/Postgres task DAG that
walks file trees, unpacks containers, extracts text/metadata per de-duplicated
blob and indexes the merged "digest" into Elasticsearch.  This package
re-expresses that dataflow as a checkpointed Spark DataFrame DAG over a table
of Common-Crawl-style pages::

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Layout:

- ``functions/``  — scalar building blocks (hashing, MIME sniffing, text
  decode/normalize, language id, quality scoring), all Arrow-vectorized.
- ``operators/``  — stage operators (html extraction, email parse, archive
  fan-out, csv tables, pdf spans, gather, dedup, similarity).
- ``plans/``      — the end-to-end pipeline driver, checkpoint/resume,
  skew-aware repartitioning, metrics.
- ``streaming/``  — incremental-sync analog via Structured Streaming.

Design rules (see SURVEY.md §7): everything relational is plain DataFrame /
SQL so Catalyst optimizes it; per-row logic lives in Arrow-batched pandas
UDFs (never row-at-a-time Python UDFs); fan-out loops are bounded driver
loops with anti-join recursion guards.
"""

__version__ = "0.1.0"
