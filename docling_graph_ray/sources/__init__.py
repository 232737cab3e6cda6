"""Input datasources beyond Parquet (WARC/WET crawl containers)."""
