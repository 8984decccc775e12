"""Crawl-policy rule data: filter lists, keywords, date windows, phrases.

Behavioral spec from the reference (cited file:line in /root/reference/
covidnews/spiders/covid_news_spider.py); the *values* here drive both the
engine and the synthetic web so correctness is checked end-to-end.
"""

from __future__ import annotations

# reference :27
SEARCH_KEYWORDS = ["covid", "pandemic", "vaccine", "coronavirus", "vaccination", "sars-cov-2"]

# reference :54-55
EXCLUDED_FILE_EXTENSIONS = [
    ".png", ".jpg", ".jpeg", ".gif", ".bmp", ".pdf", ".xls", ".mp3", ".mp4",
    ".mov", ".flv", ".doc", ".docx", ".xlsx", ".ppt", ".pptx", ".zip",
    ".webp", ".webm", ".m4v",
]

# reference :735-745 substring skip patterns
SKIP_SUBSTRINGS = ["javascript", "mailto", "whatsapp://", "play.google.com", "apps.apple.com"]

# Synthetic-web domain universe (reference analog: allowed_domain_names
# :58-77; two hot seed hosts absorb most of a country crawl :299-305).
ALLOWED_DOMAINS = [
    "cna.example",          # hot host 1 (channelnewsasia analog)
    "stimes.example",       # hot host 2 (straitstimes analog)
    "inq.example",          # inquirer analog (strong-tag DOM surgery branch)
    "bpost.example",        # bangkokpost analog (photo-div exclusion branch)
    "ktimes.example",       # khmertimes analog (multi-branch xpath)
    "mnow.example",
    "fmt.example",
    "tstar.example",
]
HOT_HOSTS = ["www.cna.example", "www.stimes.example"]

# reference irrelevant/inaccessible subdomain lists (:80-173) — analog
# patterns over our synthetic universe
IRRELEVANT_SUBDOMAIN_PATTERNS = [
    "cnalifestyle.cna.example", "luxury.cna.example", "games.stimes.example",
    "interactive.stimes.example", "shop.", "login.", "subscribe.",
]
INACCESSIBLE_SUBDOMAIN_PATTERNS = ["epaper.", "events."]

# reference incomplete_articles (:179-213) — known-bad exact URLs
INCOMPLETE_ARTICLES = [
    "https://www.cna.example/news/3000017-broken-article",
    "https://www.stimes.example/news/3000018-broken-article",
]

# reference per-country COVID date windows (:2495-2526)
DATE_WINDOWS = {  # source-domain -> (min_year, max_year)
    "cna.example": (2020, 2022),
    "stimes.example": (2020, 2022),
    "inq.example": (2020, 2023),
    "bpost.example": (2020, 2023),
    "ktimes.example": (2020, 2023),
    "mnow.example": (2020, 2023),
    "fmt.example": (2020, 2023),
    "tstar.example": (2020, 2023),
}
DEFAULT_DATE_WINDOW = (2020, 2023)

# reference get_source (:1344-1354): domain -> short code
SOURCE_CODES = {
    "cna.example": "CNA",
    "stimes.example": "ST",
    "inq.example": "INQ",
    "bpost.example": "BP",
    "ktimes.example": "KT",
    "mnow.example": "MN",
    "fmt.example": "FMT",
    "tstar.example": "TS",
}

# Footnote boilerplate phrases (representative subset of the reference's
# ~230-phrase list at :1658-1889; ORDER MATTERS — the recursion carries a
# monotone phrase-index constraint, :1926-1931).
FOOTNOTE_PHRASES = [
    "join st's telegram channel",
    "join st's whatsapp channel",
    "download our app or subscribe",
    "get the latest news delivered to your inbox",
    "follow us on facebook",
    "follow us on twitter",
    "sign up for our newsletter",
    "read next",
    "related coverage:",
    "related story:",
    "for the latest updates on the covid-19 situation",
    "subscribe to our telegram channel",
    "this article first appeared",
    "click here for more stories",
    "watch the video below",
    "copyright of the respective news agency",
    "all rights reserved",
]

# Media-credit regex deletions applied to text spans (reference
# remove_media_credit :1616-1645; representative subset, same shapes).
MEDIA_CREDIT_PATTERNS = [
    r"(?is)\([^()]*first of two parts[^()]*\)",
    r"(?is)\([^()]*second of two parts[^()]*\)",
    r"(?is)\([^()]*pic[^()]*\)",
    r"(?s)\(Image: .+?\)",
    r"(?s)\(Photo.+?\)",
    r"(?s)\(AP Photo.+?\)",
    r"(?s)\(File photo: .+?\)",
    r"(?s).*?FILE PHOTO.*?(\n|$)",
    r"(?s).*?PHOTO:.*?(\n|$)",
    r"(?s).*?REUTERS/.*?(\n|$)",
    r"(?s).*?CONTRIBUTED PHOTO.*?(\n|$)",
]

# Retry policy (reference middlewares.py:38-40, spider :636, :543-555)
RETRYABLE_STATUSES = [500, 502, 503, 504, 400, 408]
SKIP_STATUSES = [202]  # reference :883-884
MAX_RETRIES = 5

# Politeness defaults (reference DOWNLOAD_DELAY :427-428, settings.py:23-31)
DEFAULT_CRAWL_DELAY_S = 0.5
BATCH_PERIOD_S = 30.0  # virtual micro-batch period → per-host budget
DEFAULT_BUDGET_PER_BATCH = int(BATCH_PERIOD_S / DEFAULT_CRAWL_DELAY_S)  # 60
