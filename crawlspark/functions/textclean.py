"""Span-level text cleaning: media credits, footnote truncation, whitespace.

Behavioral spec from the reference:
  * ``remove_media_credit`` (covid_news_spider.py:1616-1645) — regex
    deletions of photo/credit patterns from body text;
  * ``remove_footnote`` (:1648-2014) — a sliding window (size 3) over the
    body lines; when a boilerplate phrase is found in the joined window,
    the document is truncated from the line containing the phrase start,
    the pre-phrase prefix of that line is kept, and the scan recurses with
    a monotone phrase-index constraint (:1926-1931, :2011);
  * whitespace cleanup (:1650-1651).

This is a clean-room implementation of those semantics over ordered
*spans* instead of joined text: each text span is a "line"; truncation
drops the matched-onward spans (including interleaved media spans after
the cut).  Used identically by the single-threaded oracle and by the
Arrow-batched parse/clean pandas UDFs (never a per-row Python UDF).
"""

from __future__ import annotations

import re

from crawlspark import rules

_CREDIT_RX = [re.compile(p) for p in rules.MEDIA_CREDIT_PATTERNS]
# quick-reject: every credit pattern requires one of these substrings; one
# cheap scan skips the whole regex chain for the vast majority of spans
_CREDIT_QUICK = re.compile(
    r"(?i)photo|image|reuters|pic|parts|file|screenshot|inquirer|livestream|speech"
)
# Per-pattern literal gates: each regex can only match a string containing
# its anchor literal (case-folded for (?i) patterns), so a span that passes
# the global quick-reject — common through benign words like "topic" or
# "epidemic" hitting the "pic" alternative — runs ONLY the patterns whose
# anchor occurs instead of the full chain (profiled: the chain's re.sub
# calls were ~65% of clean_spans).  Keyed by the exact pattern source: a
# rules-list edit that adds a pattern without a gate fails at import, and
# the gate-soundness property (match ⇒ anchor present) is pinned in
# tests/test_textclean.py.
_CREDIT_GATES: dict[str, tuple[str, bool]] = {  # pattern -> (literal, ci?)
    r"(?is)\([^()]*first of two parts[^()]*\)": ("first of two parts", True),
    r"(?is)\([^()]*second of two parts[^()]*\)": ("second of two parts", True),
    r"(?is)\([^()]*pic[^()]*\)": ("pic", True),
    r"(?s)\(Image: .+?\)": ("(Image: ", False),
    r"(?s)\(Photo.+?\)": ("(Photo", False),
    r"(?s).+?Photo from.+?(\n|$)": ("Photo from", False),
    r"(?s).+?Screenshot from.+?(\n|$)": ("Screenshot from", False),
    r"(?s).+?FIle photo.+?(\n|$)": ("FIle photo", False),
    r"(?s)\(AP Photo.+?\)": ("(AP Photo", False),
    r"(?s)\(File photo: .+?\)": ("(File photo: ", False),
    r"(?s)File photo of .+?(\n|$)": ("File photo of ", False),
    r"(?s)FILE-.+?(\n|$)": ("FILE-", False),
    r"(?s).*?file photo.*?(\n|$)": ("file photo", False),
    r"(?s).*?File photo.*?(\n|$)": ("File photo", False),
    r"(?s).*?FILE PHOTO.*?(\n|$)": ("FILE PHOTO", False),
    r"(?s).*?PHOTO:.*?(\n|$)": ("PHOTO:", False),
    r"(?s).*?PVL PHOTO.*?(\n|$)": ("PVL PHOTO", False),
    r"(?s).*?UAAP PHOTO.*?(\n|$)": ("UAAP PHOTO", False),
    r"(?s).*?INQUIRER PHOTO.*?(\n|$)": ("INQUIRER PHOTO", False),
    r"(?s).*?/INQUIRER\.net.*?(\n|$)": ("/INQUIRER.net", False),
    r"(?s).*?PHOTO FROM.*?(\n|$)": ("PHOTO FROM", False),
    r"(?s).*?REUTERS/.*?(\n|$)": ("REUTERS/", False),
    r"(?s).*?CONTRIBUTED PHOTO.*?(\n|$)": ("CONTRIBUTED PHOTO", False),
    r"(?s)FILE PHOTO-.+?": ("FILE PHOTO-", False),
    r"(?s)FILE PHOTO: .+?File Photo": ("FILE PHOTO: ", False),
    r"(?s)WATCH THE LIVESTREAM HERE:": ("WATCH THE LIVESTREAM HERE:", False),
    r"(?s)Watch the full speech:": ("Watch the full speech:", False),
}
_CREDIT_RX_GATED = [
    (re.compile(p), *_CREDIT_GATES[p]) for p in rules.MEDIA_CREDIT_PATTERNS
]
_PHRASES = [p.lower() for p in rules.FOOTNOTE_PHRASES]


def clean_ws(text: str) -> str:
    """Reference :1650-1651: NBSP / zero-width to space, then strip."""
    return text.replace("\xa0", " ").replace("​", " ").replace("<200b>", " ").strip()


def remove_media_credit(text: str) -> str:
    if not _CREDIT_QUICK.search(text):
        return text
    for rx, lit, ci in _CREDIT_RX_GATED:
        # the gate haystack is re-derived from the CURRENT text (an earlier
        # deletion can both remove and create anchor occurrences), so the
        # gated chain is exactly equivalent to running every rx.sub
        hay = text.lower() if ci else text
        if lit not in hay:
            continue
        text = rx.sub("", text)
    return text


def remove_footnote_lines(lines: list[str], window_size: int = 3) -> list[str]:
    """Truncate ``lines`` at the first boilerplate phrase (iterative form
    of the reference's recursion; the monotone phrase-index constraint
    means later passes only consider phrases at an index >= the previous
    match, reference :1926-1931)."""
    min_phrase_idx = 0
    # whole-doc pre-filter: find which phrases occur AT ALL (usually 0-3
    # of the 244); the windowed scan then only tests those.  Sound because
    # any window-join match is a substring of the corresponding whole-doc
    # join.
    blob = (" ".join(lines) + "\x00" + "".join(lines)).lower()
    candidates = [pi for pi, p in enumerate(_PHRASES) if p in blob]
    if not candidates:
        return lines
    while True:
        cand = [pi for pi in candidates if pi >= min_phrase_idx]
        hit = _find_footnote(lines, window_size, cand)
        if hit is None:
            return lines
        line_idx, prefix, phrase_idx = hit
        lines = lines[:line_idx]
        if prefix.strip():
            lines.append(prefix)
        min_phrase_idx = phrase_idx


def _find_footnote(
    lines: list[str], window_size: int, candidate_idxs: list[int]
) -> tuple[int, str, int] | None:
    """Scan a sliding window of ``window_size`` lines; on the first phrase
    hit return (index of line containing the phrase start, prefix of that
    line before the phrase, phrase index).  Only ``candidate_idxs``
    (phrases known to occur in the doc, in index order) are tested."""
    n = len(lines)
    for i in range(n):
        lo = max(0, i - window_size + 1)
        buf = lines[lo : i + 1]
        joined = " ".join(buf).lower()
        joined2 = "".join(buf).lower()
        for pi in candidate_idxs:
            phrase = _PHRASES[pi]
            for joined_form, sep in ((joined, 1), (joined2, 0)):
                pos = joined_form.find(phrase)
                if pos < 0:
                    continue
                # map pos back to the buffer line holding the phrase start
                acc = 0
                for bi, line in enumerate(buf):
                    end = acc + len(line)
                    if pos < end + (sep if bi < len(buf) - 1 else 1):
                        prefix = line[: max(0, pos - acc)]
                        return lo + bi, prefix, pi
                    acc = end + sep
        # only windows ending at i are checked once i advances; continue
    return None


def clean_spans(
    spans: list[tuple[str, str | None, str | None]],
) -> list[dict]:
    """Full clean pipeline over ordered (kind, text, media_ref) spans.

    1. whitespace-normalize text spans;
    2. delete media-credit patterns from text spans (a span emptied by the
       deletion is dropped — the reference deletes the text outright);
    3. footnote truncation over the *text* lines, dropping everything
       (text and media alike) after the cut point;
    4. re-number offsets.
    """
    staged: list[tuple[str, str | None, str | None]] = []
    for kind, text, media_ref in spans:
        if kind == "text":
            t = remove_media_credit(clean_ws(text or ""))
            t = t.strip()
            if not t:
                continue
            staged.append(("text", t, None))
        else:
            staged.append(("media", clean_ws(text or "") or None, media_ref))

    # footnote scan over text lines only, but truncation applies to the
    # interleaved sequence: find the surviving text lines, map back.
    text_positions = [i for i, s in enumerate(staged) if s[0] == "text"]
    lines = [staged[i][1] or "" for i in text_positions]
    kept = remove_footnote_lines(lines)
    if len(kept) != len(lines) or (kept and lines and kept[-1] != lines[-1]):
        # truncated: keep spans strictly before the first removed text line,
        # then append the edited boundary line if any.
        n_keep = len(kept)
        boundary_edited = n_keep > 0 and n_keep <= len(lines) and kept[n_keep - 1] != lines[n_keep - 1]
        n_full = n_keep - 1 if boundary_edited else n_keep
        cut_at = text_positions[n_full] if n_full < len(text_positions) else len(staged)
        out = staged[:cut_at]
        if boundary_edited:
            out.append(("text", kept[-1], None))
    else:
        out = staged

    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(out)
    ]
