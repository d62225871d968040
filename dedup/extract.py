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


_DROP_TAGS = ("script", "style", "nav", "footer", "header", "head")


def extract_text_column(col) -> "pa.Array":
    """Vectorized extract_text over a binary column (pyarrow.compute re2
    kernels — no per-row Python; the per-row ``extract_text`` below stays
    the reference implementation, parity-tested in test_extract).

    re2 has no backreferences, so the drop-block alternation runs as one
    pass per tag; re2's ``\\s`` is ASCII — identical to the per-row path
    over the corpus's ASCII-whitespace html.  Returns null for null or
    undecodable html (callers treat null as an invariant violation for
    non-null text)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    try:
        s = pc.cast(col, pa.string())
    except pa.lib.ArrowInvalid:
        # rare batch with undecodable bytes: per-row decode, bad rows null
        out = []
        vals = col.to_pylist() if not isinstance(col, list) else col
        for b in vals:
            if b is None:
                out.append(None)
                continue
            try:
                out.append(b.decode("utf-8"))
            except UnicodeDecodeError:
                out.append(None)
        s = pa.array(out, pa.string())
    s = pc.replace_substring_regex(s, pattern=r"(?s)<!--.*?-->",
                                   replacement=" ")
    for tag in _DROP_TAGS:
        s = pc.replace_substring_regex(
            s, pattern=rf"(?si)<{tag}\b[^>]*>.*?</{tag}\s*>",
            replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"<[^>]+>", replacement=" ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(s)


#: ASCII punctuation (0x21-0x2f, 0x3a-0x40, 0x5b-0x60, 0x7b-0x7e) — the
#: class deliberately keeps non-ASCII letters intact so normalization is
#: unicode-safe.  The same literal is embedded in the SQL oracle.
PUNCT_CLASS = "[!-/:-@\\[-`{-~]"


def normalize_text_column(col) -> "pa.Array":
    """C4-style text normalization for the normalized exact-dedup pass
    (the case-insensitive key-comparison analogue of the reference's
    OrdinalIgnoreCase filename matching, MainViewModel.cs:1040-1072,
    generalized to content): lowercase, ASCII punctuation → space,
    whitespace runs collapsed, trimmed.  Fully vectorized (arrow re2
    kernels); byte-identical to the DuckDB expression
    ``trim(regexp_replace(regexp_replace(lower(x), PUNCT, ' ', 'g'),
    '\\s+', ' ', 'g'))`` used by the oracle."""
    import pyarrow.compute as pc
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, pattern=PUNCT_CLASS, replacement=" ")
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim(x, characters=" ")


def normalize_text(s: str) -> str:
    """Per-row reference implementation of normalize_text_column (kept
    for parity tests; \\s stays ASCII to match re2)."""
    s = re.sub(PUNCT_CLASS, " ", s.lower())
    s = re.sub(r"\s+", " ", s, flags=re.ASCII)
    return s.strip(" ")


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
