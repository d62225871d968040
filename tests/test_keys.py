"""natural_key / order_key_bytes vs the direct pairwise comparator port
(ExplorerStyleCompare, MainViewModel.cs:942-982)."""

import random
from functools import cmp_to_key

from hypothesis import given, settings
from hypothesis import strategies as st

from dedup.keys import natural_cmp, natural_key, order_key_bytes, root_rank, url_host, url_prefix

CASES = [
    # digit runs compare numerically (doc2 < doc10)
    ("doc2", "doc10", -1),
    ("a10", "a9", 1),
    ("a010", "a9", 1),
    ("x2y", "x10y", -1),
    # '.' sorts first
    (".hidden", "ahidden", -1),
    (".z", "a", -1),
    ("a.b", "aab", -1),
    # case-insensitive
    ("ABC", "abd", -1),
    ("abc", "ABC", 0),
    # length tie-break
    ("abc", "abcd", -1),
    # numeric ties fall through then length decides
    ("a1", "a01", -1),
    ("a01b", "a1b", 1),
    # digits < letters (char-code compare when only one side is a digit)
    ("1a", "aa", -1),
    ("page-100", "page-99", 1),
]


def test_reference_cases():
    for a, b, want in CASES:
        got = natural_cmp(a, b)
        got = (got > 0) - (got < 0)
        assert got == want, (a, b, got, want)


def test_key_consistent_with_cmp_on_fixture_urls():
    rng = random.Random(7)
    urls = [f"https://host{rng.randrange(20):02d}/p/doc{rng.randrange(1000)}-{i}.html"
            for i in range(300)]
    urls += [".a", "a.b", "A10", "a9", "a010b", "x", ""]
    by_cmp = sorted(urls, key=cmp_to_key(lambda a, b: natural_cmp(a, b) or
                                         (a > b) - (a < b)))
    by_key = sorted(urls, key=lambda s: (natural_key(s), s))
    by_bytes = sorted(urls, key=lambda s: order_key_bytes(s))
    assert by_cmp == by_key
    # byte encoding must match tuple-key order (incl. the url tie-break)
    assert by_bytes == by_key


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
               max_size=12),
       st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
               max_size=12))
def test_bytes_encoding_total_order(a, b):
    """order_key_bytes must be a total order refining natural_cmp: when the
    comparator strictly orders two strings, the byte order agrees."""
    c = natural_cmp(a, b)
    ba, bb = order_key_bytes(a), order_key_bytes(b)
    if c < 0:
        assert ba < bb
    elif c > 0:
        assert ba > bb
    # c == 0 with a != b: the documented deterministic tie-break (A.6)


def test_root_rank_first_prefix_wins():
    roots = ("https://a.example/x", "https://a.example")
    assert root_rank("https://a.example/x/1.html", roots) == 0
    assert root_rank("https://a.example/y/1.html", roots) == 1
    assert root_rank("https://other/1.html", roots) == 2
    assert root_rank("HTTPS://A.EXAMPLE/x/z", roots) == 0  # case-insensitive


def test_url_derivations():
    u = "https://h.example.org/a/b/c-1.html"
    assert url_host(u) == "h.example.org"
    assert url_prefix(u) == "https://h.example.org/a/b"
