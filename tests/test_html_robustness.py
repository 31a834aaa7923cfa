"""Malformed-HTML differential tests (VERDICT r1 "What's missing" #4).

The reference extracts HTML text/titles with BeautifulSoup
(etl_pipeline.py:119-124), which tolerates unclosed tags, comments
containing tags, CDATA, and `>` inside attribute values.  The engine's
native-regex ``strip_html_tags``/``html_title`` must hold up on the same
nasty inputs.  bs4 is not in this container, so the oracle is the stdlib
``html.parser`` — the same lenient tokenizer family — comparing the
whitespace TOKEN SETS of the extracted text (the word-count purpose the
extractor serves).  Documented deviations are pinned explicitly.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pytest

from pyspark.sql import functions as F

from etl_pipeline2_0_spark.operators.extract import html_title, strip_html_tags


class _TextOracle(HTMLParser):
    """soup.get_text()-alike on the stdlib parser: visible text only —
    skips script/style subtrees, comments, and declarations."""

    def __init__(self) -> None:
        # convert_charrefs=False keeps entities literal, matching the
        # documented engine deviation, so the comparison isolates
        # STRUCTURAL tolerance (tags/comments/CDATA), not unescaping.
        super().__init__(convert_charrefs=False)
        self.chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.chunks.append(data)

    def handle_entityref(self, name):
        if not self._skip:
            self.chunks.append(f"&{name};")

    def handle_charref(self, name):
        if not self._skip:
            self.chunks.append(f"&#{name};")


def _oracle_tokens(doc: str) -> set[str]:
    p = _TextOracle()
    p.feed(doc)
    p.close()
    return set(" ".join(p.chunks).split())


def _engine(spark, doc: str) -> tuple[set[str], str]:
    row = (
        spark.createDataFrame([(doc,)], "body string")
        .select(
            strip_html_tags(F.col("body")).alias("text"),
            html_title(F.col("body")).alias("title"),
        )
        .first()
    )
    return set(row["text"].split()), row["title"]


NASTY_DOCS = [
    # Unclosed tags everywhere — lenient parsers just keep going.
    "<html><body><div>alpha <p>beta <span>gamma</body></html>",
    # Comment containing a closing </html> and a fake tag with text.
    "<html><!-- </html> <p>ghost</p> --><body>real text here</body></html>",
    # CDATA section (bogus in HTML; parsers emit nothing for it).
    "<html><body><![CDATA[ hidden cdata payload ]]>visible words</body></html>",
    # `>` inside a quoted attribute value.
    '<html><body><div title="a>b" data-x=\'c>d\'>quoted attr text</div></body></html>',
    # Script with comparison operators and a style block.
    "<html><head><style>p { color: red; }</style>"
    "<script>if (a<b && c>d) { run(); }</script></head>"
    "<body>after script</body></html>",
    # Multiple titles — first one wins.
    "<html><head><title>First</title><title>Second</title></head>"
    "<body>double title body</body></html>",
]


@pytest.mark.parametrize("doc", NASTY_DOCS, ids=[
    "unclosed-tags", "comment-with-tags", "cdata", "gt-in-attr",
    "script-style", "double-title",
])
def test_text_tokens_match_stdlib_parser(spark, doc):
    engine_tokens, _ = _engine(spark, doc)
    assert engine_tokens == _oracle_tokens(doc)


def test_ghost_comment_text_never_leaks(spark):
    tokens, _ = _engine(
        spark, "<html><!-- <p>ghost words</p> --><body>real</body></html>"
    )
    assert "ghost" not in tokens and "real" in tokens


def test_title_ignores_commented_title(spark):
    _, title = _engine(
        spark,
        "<html><head><!-- <title>Fake</title> --><title>Real</title></head>"
        "<body>x</body></html>",
    )
    assert title == "Real"


def test_first_title_wins(spark):
    _, title = _engine(spark, NASTY_DOCS[5])
    assert title == "First"


def test_unclosed_title_pinned_deviation(spark):
    # Documented deviation: lenient parsers swallow the rest of the doc as
    # title text; the engine pins the bounded choice ''.
    _, title = _engine(
        spark, "<html><head><title>Never closed<body>rest</body></html>"
    )
    assert title == ""


def test_entities_stay_literal_pinned_deviation(spark):
    # Documented deviation vs bs4: entities are not unescaped.
    tokens, _ = _engine(spark, "<html><body>fish &amp; chips</body></html>")
    assert "&amp;" in tokens
