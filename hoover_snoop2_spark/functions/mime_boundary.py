"""MIME boundary-regex fast path for ``email.feedparser``.

The stdlib feed parser compiles a fresh regex per multipart entity::

    boundaryre = re.compile(
        '(?P<sep>' + re.escape(separator) +
        r')(?P<end>--)?(?P<ws>[ \t]*)(?P<linesep>\r\n|\r|\n)?$')

Every message carries a distinct boundary, so the ``re`` module cache
misses on every single message — profiling the extraction kernel put
~25% of ALL rfc822 parsing CPU inside ``re.compile`` for this one
pattern (sre parse + compile per message).

Only the ``separator`` literal varies.  :func:`install` swaps the
``re`` binding inside ``email.feedparser`` for a shim whose ``compile``
recognizes exactly this template and returns a :class:`_BoundaryMatcher`
instead: ``line.startswith(separator)`` plus ONE module-level compiled
tail regex applied at ``pos=len(separator)``.  Anchored-literal-prefix +
tail-at-pos is match-for-match identical to the original pattern (the
literal group cannot backtrack, and ``$`` keeps whole-string semantics
when matching at a position), and the only match-object accessors the
feed parser uses on a boundary match — truthiness, ``group('end')``,
``group('linesep')`` — are served verbatim from the tail match.  Any
other pattern, or this template with a non-default flag, falls through
to the real ``re.compile`` untouched.

Equivalence is pinned by ``tests/test_email.py``'s differential fuzz
(random separators × structured/random lines, compared against the
stdlib-compiled pattern) on top of the golden-corpus byte-identity
suite.
"""

from __future__ import annotations

import email.feedparser as _feedparser
import re

#: the fixed tail of the feedparser boundary pattern (3.11 definition,
#: pinned — a future stdlib change cannot silently alter semantics
#: because compile interception verifies the full template string)
_TAIL_SRC = r")(?P<end>--)?(?P<ws>[ \t]*)(?P<linesep>\r\n|\r|\n)?$"
_TAIL_RE = re.compile(r"(?P<end>--)?(?P<ws>[ \t]*)(?P<linesep>\r\n|\r|\n)?$")
_PREFIX = "(?P<sep>"

#: inverse of re.escape: strip one backslash before any escaped char;
#: the caller VERIFIES round-trip via re.escape before trusting it
_UNESCAPE = re.compile(r"\\(.)", re.DOTALL)


class _BoundaryMatch:
    """The slice of ``re.Match`` the feed parser touches on a boundary
    match, backed by the tail match (groups are byte-identical to the
    full pattern's — the sep group is the literal itself)."""

    __slots__ = ("_sep", "_tail")

    def __init__(self, sep: str, tail: re.Match):
        self._sep = sep
        self._tail = tail

    def group(self, *args):
        if not args:
            args = (0,)
        out = []
        for g in args:
            if g in (0,):
                out.append(self._sep + self._tail.group(0))
            elif g in ("sep", 1):
                out.append(self._sep)
            elif g == "end":
                out.append(self._tail.group("end"))
            elif g == "ws":
                out.append(self._tail.group("ws"))
            elif g == "linesep":
                out.append(self._tail.group("linesep"))
            else:
                raise IndexError("no such group")
        return out[0] if len(out) == 1 else tuple(out)

    def __bool__(self) -> bool:  # pragma: no cover — matches are truthy
        return True


class _BoundaryMatcher:
    """Drop-in for the compiled boundary pattern: only ``.match`` is ever
    used (directly and as an EOF predicate via ``push_eof_matcher``)."""

    __slots__ = ("_sep", "_len")

    def __init__(self, sep: str):
        self._sep = sep
        self._len = len(sep)

    def match(self, line: str):
        if not line.startswith(self._sep):
            return None
        tail = _TAIL_RE.match(line, self._len)
        if tail is None:
            return None
        return _BoundaryMatch(self._sep, tail)


def _compile(pattern, flags=0):
    if (
        flags == 0
        and isinstance(pattern, str)
        and pattern.startswith(_PREFIX)
        and pattern.endswith(_TAIL_SRC)
    ):
        esc = pattern[len(_PREFIX):-len(_TAIL_SRC)]
        sep = _UNESCAPE.sub(r"\1", esc)
        # trust the template only when the separator round-trips through
        # re.escape exactly — anything else goes to the real engine
        if re.escape(sep) == esc:
            return _BoundaryMatcher(sep)
    return re.compile(pattern, flags)


class _ReShim:
    """``re``-module stand-in for email.feedparser's namespace: compile
    is intercepted, everything else delegates to the real module."""

    @staticmethod
    def compile(pattern, flags=0):
        return _compile(pattern, flags)

    def __getattr__(self, name):
        return getattr(re, name)


def install() -> None:
    """Idempotently swap email.feedparser's ``re`` for the shim."""
    if not isinstance(_feedparser.re, _ReShim):
        _feedparser.re = _ReShim()
