"""crawlspark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the *capabilities* of
buttercutter/covid-scraper (reference at /root/reference) on idiomatic
Spark: the frontier, URL-seen set, politeness scheduler, fetch, parse
and document store are all DataFrames over snapshot-committed Parquet
tables, driven by iterative micro-batches.  No code is ported from the
reference — it is cited (file:line) in docstrings as the behavioral spec.
"""

__version__ = "0.1.0"
