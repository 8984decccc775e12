"""Media-credit removal, footnote truncation, span cleaning."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark import rules
from crawlspark.functions import textclean as tc


def test_media_credit_inline():
    assert tc.remove_media_credit("Cases rose today. (Photo: Reuters)") == "Cases rose today. "
    assert tc.remove_media_credit("A line (Image: AFP) more") == "A line  more"
    assert "FILE PHOTO" not in tc.remove_media_credit("x FILE PHOTO: y\nnext")


def test_footnote_simple_truncation():
    lines = ["real para one", "real para two", "Join ST's Telegram channel today.", "trailing junk"]
    assert tc.remove_footnote_lines(lines) == ["real para one", "real para two"]


def test_footnote_prefix_kept():
    lines = ["real para", "useful text join st's telegram channel and more", "junk"]
    out = tc.remove_footnote_lines(lines)
    assert out == ["real para", "useful text "]


def test_footnote_split_across_lines():
    # phrase split over two lines — caught by the space-joined window
    lines = ["para", "join st's", "whatsapp channel now", "junk"]
    out = tc.remove_footnote_lines(lines)
    assert out == ["para"]


def test_footnote_multiple_phrases():
    # two phrases in list order (monotone index constraint allows both)
    lines = ["para", "download our app for more", "mid", "this article was first published in 2020"]
    assert tc.remove_footnote_lines(lines) == ["para"]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["plain text line", "another line", rules.FOOTNOTE_PHRASES[0], rules.FOOTNOTE_PHRASES[5],
     "x " + rules.FOOTNOTE_PHRASES[2] + " y"]), max_size=8))
def test_footnote_output_is_prefix(lines):
    """Property (SURVEY §5): output = prefix of input lines ∪ one edited
    boundary line."""
    out = tc.remove_footnote_lines(list(lines))
    assert len(out) <= len(lines)
    for i in range(len(out) - 1):
        assert out[i] == lines[i]
    if out:
        last = out[-1]
        assert last == lines[len(out) - 1] or lines[len(out) - 1].startswith(last)


def test_clean_spans_interleaved():
    spans = [
        ("text", "Real paragraph about covid.", None),
        ("media", "Photo: Agency 1", "https://img.cna.example/m/1.jpg"),
        ("text", "Another paragraph. (Photo: Reuters)", None),
        ("text", "Join ST's Telegram channel today.", None),
        ("media", None, "https://img.cna.example/m/2.jpg"),
        ("text", "after footer junk", None),
    ]
    out = tc.clean_spans(spans)
    kinds = [(s["kind"], s["text"]) for s in out]
    assert kinds == [
        ("text", "Real paragraph about covid."),
        ("media", "Photo: Agency 1"),
        ("text", "Another paragraph."),
    ]
    assert [s["offset"] for s in out] == [0, 1, 2]


def test_clean_spans_drops_emptied_credit_span():
    out = tc.clean_spans([("text", "(Photo: Reuters)", None), ("text", "keep me covid", None)])
    assert [s["text"] for s in out] == ["keep me covid"]


def test_mojibake_table_is_exact_inverse_of_damage():
    """The repair table is generated as char.encode('utf-8')
    .decode('cp1252'); applying the chained repairs to damaged text must
    reproduce the original, and clean ASCII must pass through unchanged
    (idempotence on already-repaired text too)."""
    from crawlspark.queries import _MOJIBAKE_CHARS, _MOJIBAKE_TABLE

    def repair(s: str) -> str:
        for m, c in _MOJIBAKE_TABLE:
            s = s.replace(m, c)
        return s

    clean = "It's a plain ascii sentence - nothing to fix."
    assert repair(clean) == clean

    # note: no U+201D here — its 0x9D byte is a cp1252 hole, i.e. that
    # damage form cannot occur (the table excludes it by construction)
    original = "don’t — “quoted… café señor Müller-ish ö è á"
    damaged = original.encode("utf-8").decode("cp1252")
    assert damaged != original
    assert repair(damaged) == original
    assert repair(repair(damaged)) == original  # idempotent

    # every table row actually round-trips its character
    for c in _MOJIBAKE_CHARS:
        assert repair(c.encode("utf-8").decode("cp1252")) == c

    # longest-first ordering: no 2-char accent rule can fire inside a
    # still-unrepaired 3-char punctuation sequence
    lens = [len(m) for m, _ in _MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)


def _ungated_chain(text: str) -> str:
    """The pre-gate reference semantics: every credit regex, in order."""
    for rx in tc._CREDIT_RX:
        text = rx.sub("", text)
    return text


def test_credit_gate_table_is_complete():
    assert set(tc._CREDIT_GATES) == set(rules.MEDIA_CREDIT_PATTERNS)


def test_credit_gates_are_sound():
    """A pattern can only match text containing its gate literal: strip
    the literal (case-folded for ci gates) out of any string and the
    regex must not match what remains."""
    import re

    for p, (lit, ci) in tc._CREDIT_GATES.items():
        rx = re.compile(p)
        probe = f"before {lit} middle {lit.upper()} after\nnext line"
        without = re.sub(re.escape(lit), "", probe, flags=re.I if ci else 0)
        if ci:
            assert lit.lower() not in without.lower()
        else:
            assert lit not in without
        assert rx.search(without) is None, p


@given(st.lists(st.sampled_from(
    ["Cases rose. ", "(Photo: AFP)", "p(first of two parts)ic",
     "FILE PHOTO: x File Photo", "epidemic topic ", "REUTERS/Manila\n",
     "x /INQUIRER.net y\n", "(Image: z)", "plain text line\n",
     "File photo of a site ", "WATCH THE LIVESTREAM HERE:",
     "(pIc inside)", "a FILE- b\n"]), min_size=0, max_size=6))
@settings(max_examples=200, deadline=None)
def test_gated_chain_equals_ungated(parts):
    text = "".join(parts)
    assert tc.remove_media_credit(text) == _ungated_chain(text)
