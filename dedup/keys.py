"""Ordering and scope keys.

``natural_key`` is a from-scratch Python re-derivation of the
reference's explorer-style collation (``ExplorerStyleCompare``,
ViewModels/MainViewModel.cs:942-982):

  * ``'.'`` sorts before every other character;
  * runs of ASCII digits on both sides compare as arbitrary-precision
    integers (``'doc2' < 'doc10'``, ``'a01' == 'a1'`` numerically);
  * otherwise case-insensitive char compare;
  * all equal -> shorter string first (final ``a.Length.CompareTo``).

The reference's comparator can declare two *different* strings equal
(``'a1b'`` vs ``'a01'`` — numeric tie then equal length), and ties on
equal basenames fall back to OS enumeration order (SURVEY.md §A.6).  We
replace that nondeterminism with a total order: the encoded natural key
followed by the raw string as tie-break.

``order_key_bytes`` linearizes (root_rank, natural_key(s), s) into a
single ``binary`` value whose unsigned lexicographic byte order equals
the comparator order — so "cluster representative = minimum member in
global order" becomes a plain ``min()`` over a binary column, an
order-insensitive reduce that is deterministic at any parallelism.
"""

from __future__ import annotations

from functools import lru_cache

# token first-field classes (must preserve comparator order):
#   terminator(0) < '.'(1) < everything else (ord+2; digits use 0x30+2)
_TERM = 0
_DOT = 1
_NUM = 0x30 + 2


def natural_key(s: str) -> tuple:
    """Tuple that sorts (within reason, see module docstring) like
    ``ExplorerStyleCompare``; used by the test oracle.  Each token is
    ``(cls, aux)``; a trailing terminator carries ``len(s)`` so prefix
    ties resolve by string length as in the reference."""
    toks: list[tuple] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if "0" <= c <= "9":
            j = i
            while j < n and "0" <= s[j] <= "9":
                j += 1
            toks.append((_NUM, int(s[i:j])))
            i = j
        elif c == ".":
            toks.append((_DOT, 0))
            i += 1
        else:
            lc = c.lower()
            toks.append((ord(lc if len(lc) == 1 else c) + 2, 0))
            i += 1
    toks.append((_TERM, n))
    return tuple(toks)


_NUM_B = _NUM.to_bytes(4, "big")
_TERM_B = _TERM.to_bytes(4, "big")
_DIGIT_RUN = __import__("re").compile(r"[0-9]+")


# per-ASCII-char class encodings ('.' -> class 1, else ord(lower)+2);
# digits are included harmlessly (digit runs never reach _enc_nondigit)
_CLS: dict[str, bytes] = {}
for _i in range(128):
    _c = chr(_i)
    _CLS[_c] = (b"\x00\x00\x00\x01" if _c == "." else
                (ord(_c.lower() if len(_c.lower()) == 1 else _c) + 2)
                .to_bytes(4, "big"))
del _i, _c


@lru_cache(maxsize=1 << 16)
def _enc_nondigit(sub: str) -> bytes:
    """Class encoding of a digit-free substring, memoized: the non-digit
    segments of crawl urls (scheme/host/path words/extensions) repeat
    massively, so the per-char work runs once per DISTINCT segment
    instead of once per row (this function dominated Preparer wall time
    on url-keyed corpora — VERDICT r3 #3)."""
    try:
        return b"".join(map(_CLS.__getitem__, sub))
    except KeyError:
        out = bytearray()
        for c in sub:
            e = _CLS.get(c)
            if e is None:
                lc = c.lower()
                e = (ord(lc if len(lc) == 1 else c) + 2).to_bytes(4, "big")
            out += e
        return bytes(out)


def order_key_bytes(s: str, root_rank: int = 0) -> bytes:
    """Sortable byte encoding of (root_rank, natural_key(s), s).

    Encoding per token: 4-byte big-endian class, then for digit runs a
    2-byte length of the zero-stripped digit string + the digits (exact
    arbitrary-precision numeric order: shorter stripped run = smaller
    number; equal length => lexicographic digit compare).  Terminator is
    class 0 + 4-byte len(s); the raw UTF-8 string follows as tie-break.
    """
    parts = [root_rank.to_bytes(4, "big")]
    pos = 0
    for m in _DIGIT_RUN.finditer(s):
        parts.append(_enc_nondigit(s[pos:m.start()]))
        d = m.group().lstrip("0")
        parts.append(_NUM_B + len(d).to_bytes(2, "big") + d.encode())
        pos = m.end()
    parts.append(_enc_nondigit(s[pos:]))
    parts.append(_TERM_B + len(s).to_bytes(4, "big") + s.encode())
    return b"".join(parts)


def natural_cmp(a: str, b: str) -> int:
    """Direct pairwise port of ExplorerStyleCompare (MainViewModel.cs:944-982);
    used only in tests to cross-check ``natural_key``/``order_key_bytes``."""
    ai = bi = 0
    while ai < len(a) and bi < len(b):
        ca, cb = a[ai], b[bi]
        if ca == "." and cb != ".":
            return -1
        if cb == "." and ca != ".":
            return 1
        da = "0" <= ca <= "9"
        db = "0" <= cb <= "9"
        if da and db:
            sa, sb = ai, bi
            while ai < len(a) and "0" <= a[ai] <= "9":
                ai += 1
            while bi < len(b) and "0" <= b[bi] <= "9":
                bi += 1
            na, nb = int(a[sa:ai]), int(b[sb:bi])
            if na != nb:
                return -1 if na < nb else 1
            continue
        la, lb = ca.lower(), cb.lower()
        la = la if len(la) == 1 else ca
        lb = lb if len(lb) == 1 else cb
        if la != lb:
            return -1 if la < lb else 1
        ai += 1
        bi += 1
    if len(a) != len(b):
        return -1 if len(a) < len(b) else 1
    return 0


# ---------------------------------------------------------------------------
# URL-derived scope attributes (path analogues; SURVEY.md §1.1 derived attrs)
# ---------------------------------------------------------------------------

def url_host(url: str) -> str:
    """Disk analogue (Path.GetPathRoot, MainViewModel.cs:1025)."""
    rest = url.split("://", 1)[-1]
    return rest.split("/", 1)[0]


def url_prefix(url: str) -> str:
    """Directory analogue (Path.GetDirectoryName, MainViewModel.cs:1037):
    everything up to the last '/'."""
    return url.rsplit("/", 1)[0]


def url_stem(ident) -> str:
    """Filename-without-extension analogue
    (Path.GetFileNameWithoutExtension, MainViewModel.cs:1049):
    last path segment, extension stripped, for the stem predicates."""
    s = str(ident)
    seg = s.rsplit("/", 1)[-1]
    dot = seg.rfind(".")
    return seg[:dot] if dot > 0 else seg


@lru_cache(maxsize=64)
def _roots_lower(roots: tuple[str, ...]) -> tuple[str, ...]:
    return tuple(r.lower() for r in roots)


def root_rank(url: str, roots: tuple[str, ...]) -> int:
    """First configured root whose prefix matches, in list order
    (GetUserFolder, MainViewModel.cs:522-527; case-insensitive prefix per
    :525).  Returns len(roots) when no root matches."""
    u = url.lower()
    for i, r in enumerate(_roots_lower(roots)):
        if u.startswith(r):
            return i
    return len(roots)
