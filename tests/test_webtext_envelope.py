"""Pins the webtext HTML envelope (raycrawl/webtext.py ANCHOR_PAT
docstring table): for every adversarial form, BOTH extraction engines —
polars ``str.extract_all`` (the Ray path) and DuckDB
``regexp_extract_all`` (the oracle path) — must agree with each other
AND with the documented parsed/not-parsed verdict. No Ray needed."""

import duckdb
import polars as pl
import pytest

from raycrawl.webtext import ANCHOR_PAT

# (html, expected list of (href, anchor)) — expected == [] means the
# docstring documents the form as NOT parsed
CASES = [
    # --- parsed forms ---
    ('<a href="http://x.com">text</a>', [("http://x.com", "text")]),
    ('<a href="u" class="c" id=y>t</a>', [("u", "t")]),
    ('<a href="u">line1\nline2</a>', [("u", "line1\nline2")]),
    ('<a href="a">one</a> mid <a href="b">two</a>',
     [("a", "one"), ("b", "two")]),
    ('<a href="">empty</a>', [("", "empty")]),
    ('<a href="u"></a>', [("u", "")]),
    ('<a href="u?q=1&amp;r=2">A &amp; B</a>',
     [("u?q=1&amp;r=2", "A &amp; B")]),
    # --- documented NOT-parsed forms ---
    ("<a href='u'>t</a>", []),
    ('<a href=u>t</a>', []),
    ('<A HREF="u">t</A>', []),
    ('<a HREF="u">t</a>', []),
    ('<a class="x" href="u">t</a>', []),
    ('<a  href="u">t</a>', []),
    ('<a\nhref="u">t</a>', []),
    ('<a href="u"><b>bold</b></a>', []),
    ('<a href="u">unclosed', []),
    ('<a href="u">t</a >', []),
]

# attribute value containing '>' after href: href survives, text is wrong
TRUNCATION_CASE = ('<a href="u" data-x="b>c">t</a>', [("u", 'c">t')])


def _polars(html: str) -> list[tuple[str, str]]:
    df = pl.DataFrame({"h": [html]})
    m = df.with_columns(pl.col("h").str.extract_all(ANCHOR_PAT).alias("m"))
    m = m.explode("m").drop_nulls("m").with_columns(
        pl.col("m").str.extract(ANCHOR_PAT, 1).alias("href"),
        pl.col("m").str.extract(ANCHOR_PAT, 2).alias("anchor"))
    return list(zip(m["href"].to_list(), m["anchor"].to_list()))


def _duckdb(html: str) -> list[tuple[str, str]]:
    rows = duckdb.connect().execute(
        "SELECT list_zip(regexp_extract_all(?, ?, 1), "
        "regexp_extract_all(?, ?, 2))",
        [html, ANCHOR_PAT, html, ANCHOR_PAT]).fetchone()[0]
    return [(a, b) for a, b in rows]


@pytest.mark.parametrize("html,expected", CASES + [TRUNCATION_CASE])
def test_anchor_envelope_both_engines(html, expected):
    got_pl = _polars(html)
    got_db = _duckdb(html)
    assert got_pl == got_db, f"engines disagree on {html!r}"
    assert got_pl == expected, f"envelope drift on {html!r}"
