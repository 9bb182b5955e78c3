"""replicheck_spark — a PySpark-native near-duplicate detection & clustering engine.

Built from scratch (not a port) with the query / data-processing capabilities of
karar-hayder/Replicheck (reference @ /root/reference), reimagined as a web-scale
dedup pipeline over Common-Crawl-style page tables
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Design blueprint: SURVEY.md. Everything here derives from public knowledge only:
the Apache Spark / PySpark API and the reference repo's observable behavior.
"""

from replicheck_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
