"""HTML → text extraction, the crawl pipeline's first text step.

A training-data pipeline's documents start as HTML; every quality /
dedup / language op downstream (operators/textstats.py, dedup.py)
consumes the EXTRACTED text.  This is a from-scratch, stdlib-only
extractor built for crawl robustness, not DOM fidelity:

* a single-pass tokenizer over ``<...>`` boundaries that never throws
  on malformed markup (unclosed tags, bare ``<``, attribute soup);
* ``script``/``style``/``noscript``/``template`` subtrees dropped
  (case-insensitive, tolerant of attributes and missing close tags at
  EOF);
* comments and CDATA removed, DOCTYPE/processing instructions ignored;
* block-level tags (p, div, br, li, tr, headings, ...) become
  newlines, inline tags vanish, whitespace collapses per line;
* entities decoded with the stdlib ``html.unescape`` (the full HTML5
  named-entity table — public data shipped with CPython);
* a ``title`` column and simple link/word counts for quality filters.

``html_extract`` maps blob/text rows to (text, title, n_links,
n_words) with the crawl contract: any row that still manages to break
the extractor is marked ok=false, never a task kill.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator

_DROP = {"script", "style", "noscript", "template"}
_BLOCK = {"p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2",
          "h3", "h4", "h5", "h6", "section", "article", "header",
          "footer", "blockquote", "pre", "hr", "form", "dd", "dt"}

_TAG_RE = re.compile(
    r"<!--.*?(?:-->|$)"            # comments (unterminated: to EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"  # CDATA
    r"|<!DOCTYPE[^>]*>"
    r"|<\?[^>]*>"                  # processing instructions
    r"|</?([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>?",
    re.DOTALL | re.IGNORECASE)
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n\s*\n+")


def extract_text(doc: str) -> dict:
    """Text + title + counts from one HTML document (never raises on
    malformed markup; raises TypeError only on non-string input)."""
    out: list[str] = []
    title_parts: list[str] = []
    n_links = 0
    pos = 0
    skip_until: str | None = None
    in_title = False
    for m in _TAG_RE.finditer(doc):
        seg = doc[pos:m.start()]
        if seg and skip_until is None:
            if in_title:
                title_parts.append(seg)   # rendered in the tab, not the page
            else:
                out.append(seg)
        pos = m.end()
        name = (m.group(1) or "").lower()
        if not name:
            continue                       # comment/doctype/cdata/PI
        closing = doc[m.start() + 1] == "/"
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if not closing and name in _DROP:
            skip_until = name
            continue
        if name == "title":
            in_title = not closing
        if name == "a" and not closing:
            n_links += 1
        if name in _BLOCK:
            out.append("\n")
    tail = doc[pos:]
    if tail and skip_until is None:
        out.append(tail)
    text = _html.unescape("".join(out))
    lines = [_WS_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    text = _NL_RE.sub("\n", "\n".join(ln for ln in lines if ln)).strip()
    title = _WS_RE.sub(" ", _html.unescape("".join(title_parts))).strip()
    return {"text": text, "title": title, "n_links": n_links,
            "n_words": len(text.split()) if text else 0}


HTML_SCHEMA = ("doc_id long, text string, title string, n_links int, "
               "n_words int, ok boolean")


def html_extract(df, *, html_col: str = "html", id_col: str = "doc_id"):
    """DataFrame of HTML documents -> extracted-text rows (crawl
    contract: broken rows ok=false, never fatal).  Downstream ops
    (repetition_stats, substring_dup_spans, lang/quality scores)
    consume the `text` column unchanged."""
    import pandas as pd

    def _run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, doc in zip(pdf[id_col], pdf[html_col]):
                did = int(did)
                try:
                    if isinstance(doc, (bytes, bytearray)):
                        doc = bytes(doc).decode("utf-8", "replace")
                    e = extract_text(doc)
                    rows.append((did, e["text"], e["title"], e["n_links"],
                                 e["n_words"], True))
                except Exception:
                    rows.append((did, None, None, 0, 0, False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "text", "title", "n_links", "n_words", "ok"])

    return df.select(id_col, html_col).mapInPandas(_run, schema=HTML_SCHEMA)
