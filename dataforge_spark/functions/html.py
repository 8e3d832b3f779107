"""HTML → text extraction for web-crawl corpora (boilerplate strip,
link/title harvest) — the step between WARC ingestion (``warc.py``)
and the text-quality/dedup tiers. Extension surface over the
reference (``SURVEY.md §2`` covers plain-text ops only; reference
``methods/text_cleaning.py`` has a bare ``<[^>]+>`` regex strip with
no script/entity/block handling).

Built on the stdlib ``html.parser`` state machine (public CPython
API) rather than a regex: regexes cannot correctly skip
``<script>``/``<style>`` payloads, decode entities, or survive
attributes containing ``>``. All three functions are Arrow-batched
``pandas_udf``\\ s — the sanctioned slow path for genuinely
non-relational per-row logic; everything around them (filters,
aggregations, joins) stays JVM-side.

Whitespace contract of ``html_to_text`` (deterministic, the property
the correctness oracle recomputes):

- block-level tags (``p div br li h1-h6 tr table section article
  header footer ul ol blockquote pre hr form``) open/close emit a
  line break; inline tags (``a span b i em strong code …``) do not;
- ``script style noscript template head svg iframe`` subtrees are
  dropped entirely;
- character/entity references decode (``&amp;`` → ``&``);
- each output line collapses internal whitespace runs to one space;
  empty lines are dropped; lines join with ``\\n``.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_BLOCK = {
    "p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr",
    "table", "section", "article", "header", "footer", "ul", "ol",
    "blockquote", "pre", "hr", "form", "td", "th", "dd", "dt", "main",
    "nav", "aside", "figure", "figcaption",
}
_SKIP = {"script", "style", "noscript", "template", "head", "svg", "iframe"}


class _Extractor(HTMLParser):
    """Accumulates visible text, hrefs and the <title>."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self.title_parts: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value:
                    self.links.append(value)
        if tag in _BLOCK:
            self.chunks.append("\n")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        # no matching end tag will arrive for <br/> etc.
        if tag in _SKIP:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self.chunks.append("\n")

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        if self._skip_depth == 0:
            self.chunks.append(data)

    def text(self) -> str:
        lines = "".join(self.chunks).split("\n")
        out = [" ".join(line.split()) for line in lines]
        return "\n".join(line for line in out if line)

    def title(self) -> str | None:
        t = " ".join("".join(self.title_parts).split())
        return t or None


def _parse(doc: str) -> _Extractor:
    ex = _Extractor()
    ex.feed(doc)
    ex.close()
    return ex


# pandas_udf construction needs an active SparkSession (DDL return-type
# parse), so the UDFs are built lazily on first column use.
_UDFS: dict[str, object] = {}


def _udf(name: str, ret: str, fn):
    if name not in _UDFS:
        _UDFS[name] = pandas_udf(ret)(fn)
    return _UDFS[name]


def html_to_text(col) -> Column:
    """Visible text of an HTML document under the module's whitespace
    contract; null in → null out."""
    f = _udf(
        "text", "string",
        lambda s: s.map(lambda d: None if d is None else _parse(d).text()),
    )
    return f(F.col(col) if isinstance(col, str) else col)


def html_links(col) -> Column:
    """All ``<a href>`` values, in document order (crawl frontier /
    link-graph feed)."""
    f = _udf(
        "links", "array<string>",
        lambda s: s.map(lambda d: None if d is None else _parse(d).links),
    )
    return f(F.col(col) if isinstance(col, str) else col)


def html_title(col) -> Column:
    """Whitespace-normalized ``<title>`` text, or null if absent."""
    f = _udf(
        "title", "string",
        lambda s: s.map(lambda d: None if d is None else _parse(d).title()),
    )
    return f(F.col(col) if isinstance(col, str) else col)


def html_extract(col) -> Column:
    """One-parse combined extraction:
    ``struct<text string, title string, links array<string>>`` —
    select the fields you need. 3x cheaper than calling the three
    single-field functions on the same column (each would re-parse
    the document)."""

    def run(s):
        # a struct-returning pandas_udf must yield a DataFrame with one
        # column per field (None cells → null fields)
        texts, titles, links = [], [], []
        for d in s:
            if d is None:
                texts.append(None)
                titles.append(None)
                links.append(None)
            else:
                ex = _parse(d)
                texts.append(ex.text())
                titles.append(ex.title())
                links.append(ex.links)
        return pd.DataFrame(
            {"text": texts, "title": titles, "links": links}
        )

    f = _udf(
        "extract", "struct<text:string,title:string,links:array<string>>", run
    )
    return f(F.col(col) if isinstance(col, str) else col)
