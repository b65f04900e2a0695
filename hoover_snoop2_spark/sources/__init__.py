"""Ingest connectors that materialize the pinned pages input table
(url, warc_ts, html, text, lang) from raw crawl artifacts."""
