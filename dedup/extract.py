"""Byte-stable HTML -> text extraction.

The pipeline's per-row invariant (BASELINE.json input_hint) is that the
extracted text of each page equals the stored ``text`` column
byte-for-byte — the analogue of the reference's streamed byte comparator
(MainViewModel.cs:1094-1146).  To keep the function deterministic across
environments it is dependency-free pure Python (no html parser libs),
golden-tested against the fixture generator in :mod:`dedup.synth`.

Rules (matched to the synth template, FIXTURES.md F1):
  * drop everything inside <script>/<style> and HTML comments;
  * <nav>/<footer>/<header> blocks are boilerplate — dropped;
  * remaining tags are stripped; entities &amp; &lt; &gt; &quot; &#39;
    unescaped; whitespace runs collapsed to single spaces, text stripped.
"""

from __future__ import annotations

import re

_DROP_BLOCKS = re.compile(
    r"<(script|style|nav|footer|header|head)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_TAGS = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # must be last
)


def extract_text(html: bytes | str) -> str:
    """Deterministic text extraction; returns '' for undecodable input
    (the caller routes those rows to state='error', never silently)."""
    if isinstance(html, bytes):
        try:
            html = html.decode("utf-8")
        except UnicodeDecodeError:
            return ""
    s = _COMMENTS.sub(" ", html)
    s = _DROP_BLOCKS.sub(" ", s)
    s = _TAGS.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS.sub(" ", s).strip()
