"""weblog_pipeline — PySpark-native span-event→log parse→enrich→route→aggregate
engine over Common-Crawl-style web pages. See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
