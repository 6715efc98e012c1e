"""HTML → main-text extraction for Common-Crawl-style pages.

The north-star input shape carries `html:binary` next to `text:string`
with a per-row invariant of byte-identical extracted text per url.  This
module is the extraction stage that produces that `text` column from the
raw markup: an ordered, deterministic regexp cascade (drop head/script/
style/nav/footer/aside boilerplate blocks, strip comments, map block
tags to newlines, strip remaining tags, decode the basic entity set,
normalize whitespace).

Design:

- :func:`extract_text_expr` — the hot path: a pure Catalyst
  ``regexp_replace``/``replace`` cascade (JVM, codegen'd, zero Python)
  that rides the scan at 10^12 pages — no shuffle, no UDF.
- :func:`extract_text_str` — the same ordered substitutions as a pure
  Python function (compiled once per worker), exposed for the Arrow UDF
  twin, unit vectors, and byte-level parity tests.
- the DuckDB oracle twin is generated from the SAME pattern constants
  (`queries.py:html_extract_pages`), so Spark(Java regex), Python `re`,
  and DuckDB(RE2) are compared byte-for-byte on the fixture corpus.

Patterns are restricted to the Java/`re`/RE2 common subset (no
backrefs, no lookaround; ``\\b`` is the ASCII word boundary in all
three; inline ``(?is)`` flags supported by all three).  Replacement
strings avoid engine-specific escape processing: newlines are passed as
literal characters (Java's ``replaceAll`` treats ``\\n`` in the
*replacement* as an escaped literal ``n``, unlike the pattern side).

Like every regex extractor, nested same-tag blocks (a ``<nav>`` inside
a ``<nav>``) terminate at the first closing tag — the documented
trade-off for a scan-speed extractor with no per-row parser state.

The reference framework has no HTML operator (its text handling starts
at string-level standardization, `dataquality-standardization/.../
StringHandler.java:1`); this is a training-data-pipeline extension on
top, same device as `operators/urltools.py`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Boilerplate blocks dropped wholesale (content removed).  `\b` keeps
# `<head>` from eating `<header>`.
DROP_BLOCK_TAGS: tuple[str, ...] = ("script", "style", "head", "nav", "footer", "aside")

COMMENT_RX = r"(?s)<!--.*?-->"

# CDATA sections are opaque payload, dropped wholesale (before the
# generic tag strip, whose [^>]* would stop at any '>' in the payload).
CDATA_RX = r"(?s)<!\[CDATA\[.*?\]\]>"

# Block-level tags become newlines (paragraph/section boundaries).
BLOCK_TAG_RX = (
    r"(?is)</?(?:p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody"
    r"|section|article|header|main|figure|figcaption|blockquote|pre|hr|form)\b[^>]*>"
)

# Any remaining tag or declaration is dropped (inline markup a/span/em/…,
# plus <!DOCTYPE …> / <?xml …?> — real Common-Crawl pages lead with a
# doctype, so the leading [!/?]? matters on every page).
ANY_TAG_RX = r"(?s)<[!/?]?[a-zA-Z][^>]*>"

# Basic entity set, decoded in order — `&amp;` LAST so literal text that
# round-tripped through escaping (`&lt;` → `&amp;lt;`) decodes once, not
# twice.  Numeric character references decode between the named set and
# `&amp;` (see NUMREF_RX below) for the same single-decode reason:
# `&amp;#8217;` must yield the literal text `&#8217;`, not `’`.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# Numeric character references: decimal (&#8217;) and hex (&#x2019; /
# &#X2019;, any digit case, leading zeros allowed).  No backslash in the
# pattern, so the identical bytes run in Java, `re`, and RE2.
NUMREF_RX = r"&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"

# Decode device (identical in all three engines): collect the DISTINCT
# refs of the row, sort them (bytewise — refs are pure ASCII), and fold
# `replace(acc, ref, decoded)` over the document — the pii.py sorted-fold
# device.  A ref decodes only when its codepoint is a Unicode scalar
# value (1..0x10FFFF excluding surrogates — DuckDB's chr() errors on
# NUL/surrogates and Java's UTF-8 decoder would smuggle U+FFFD in);
# anything else stays literal text.  Two documented single-pass
# divergences from a browser, both engine-consistent: a ref whose
# replacement CREATES another listed ref decodes twice (`&#38;#66;`
# alongside `&#66;`), and refs are replaced corpus-order-independently
# (sorted set, not left-to-right scan).
_CP_MIN, _CP_MAX = 1, 0x10FFFF
_SUR_LO, _SUR_HI = 0xD800, 0xDFFF

# Whitespace normalization: collapse blanks, tighten newlines, trim.
# `\n` is spelled as a pattern escape (identical in Java/`re`/RE2) but
# passed as a literal character on the replacement side.  Vertical tab is
# spelled `\x0B`, NOT `\v`: Java's `\v` is a vertical-WHITESPACE CLASS
# (includes `\n`), while RE2/`re` treat it as the single VT char.
WS_BLANKS_RX = r"[ \t\r\f\x0B]+"
WS_AROUND_NL_RX = r" *\n *"
WS_MULTI_NL_RX = r"\n+"
TRIM_CHARS = " \n"


def _drop_block_rx(tag: str) -> str:
    return rf"(?is)<{tag}\b[^>]*>.*?</{tag}>"


def ws_normalize_expr(col: Column) -> Column:
    """Whitespace-normalize (expression form): blank runs → one space,
    spaces around newlines dropped, newline runs → one, edges trimmed."""
    out = F.regexp_replace(col, WS_BLANKS_RX, " ")
    out = F.regexp_replace(out, WS_AROUND_NL_RX, "\n")
    out = F.regexp_replace(out, WS_MULTI_NL_RX, "\n")
    return F.btrim(out, F.lit(TRIM_CHARS))


def decode_numrefs_expr(col: Column) -> Column:
    """Decode numeric character references (expression form): sorted
    fold over the row's distinct refs; the codepoint's UTF-8 bytes are
    built arithmetically (`unhex` + `decode`) because Spark's `chr()`
    is ASCII-mod-256, not Unicode.  Refs per row are few, so the
    interpreted-HOF fold cost is the same class as pii.py's."""

    def _decode_one(acc: Column, r: Column) -> Column:
        is_hex = F.lower(F.substring(r, 3, 1)) == "x"
        digits = F.regexp_replace(r, "[&#xX;]", "")
        cp = (
            F.when(is_hex, F.conv(digits, 16, 10).cast("long"))
            .otherwise(digits.cast("long"))
        )
        valid = (
            (cp >= _CP_MIN)
            & (cp <= _CP_MAX)
            & ((cp < _SUR_LO) | (cp > _SUR_HI))
        )
        hexstr = (
            F.when(cp < 0x80, F.format_string("%02X", cp))
            .when(
                cp < 0x800,
                F.format_string(
                    "%02X%02X",
                    F.shiftright(cp, 6) + 192,
                    cp % 64 + 128,
                ),
            )
            .when(
                cp < 0x10000,
                F.format_string(
                    "%02X%02X%02X",
                    F.shiftright(cp, 12) + 224,
                    F.shiftright(cp, 6) % 64 + 128,
                    cp % 64 + 128,
                ),
            )
            .otherwise(
                F.format_string(
                    "%02X%02X%02X%02X",
                    F.shiftright(cp, 18) + 240,
                    F.shiftright(cp, 12) % 64 + 128,
                    F.shiftright(cp, 6) % 64 + 128,
                    cp % 64 + 128,
                )
            )
        )
        ch = F.decode(F.unhex(hexstr), "UTF-8")
        return F.replace(acc, r, F.when(valid, ch).otherwise(r))

    refs = F.array_sort(
        F.array_distinct(F.regexp_extract_all(col, F.lit(NUMREF_RX), 0))
    )
    return F.aggregate(refs, col, _decode_one)


def extract_text_expr(col: Column) -> Column:
    """Extract main text from HTML markup — pure Catalyst expression
    cascade (the 100 TB hot path: rides the scan, no Python)."""
    out = col
    for tag in DROP_BLOCK_TAGS:
        out = F.regexp_replace(out, _drop_block_rx(tag), "")
    out = F.regexp_replace(out, CDATA_RX, "")
    out = F.regexp_replace(out, COMMENT_RX, "")
    out = F.regexp_replace(out, BLOCK_TAG_RX, "\n")
    out = F.regexp_replace(out, ANY_TAG_RX, "")
    for ent, ch in ENTITIES[:-1]:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = decode_numrefs_expr(out)
    out = F.replace(out, F.lit(ENTITIES[-1][0]), F.lit(ENTITIES[-1][1]))
    return ws_normalize_expr(out)


def escape_text_expr(col: Column) -> Column:
    """HTML-escape a text column (`&` first) — the synthesis-side inverse
    of the entity decode above; used by fixture generators."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


# --- Python twin (compiled once per worker / test process) -----------------

_PY_DROPS = tuple(re.compile(_drop_block_rx(t)) for t in DROP_BLOCK_TAGS)
_PY_CDATA = re.compile(CDATA_RX)
_PY_COMMENT = re.compile(COMMENT_RX)
_PY_BLOCK = re.compile(BLOCK_TAG_RX)
_PY_ANY = re.compile(ANY_TAG_RX)
_PY_BLANKS = re.compile(WS_BLANKS_RX)
_PY_AROUND_NL = re.compile(WS_AROUND_NL_RX)
_PY_MULTI_NL = re.compile(WS_MULTI_NL_RX)


def ws_normalize_str(s: str) -> str:
    s = _PY_BLANKS.sub(" ", s)
    s = _PY_AROUND_NL.sub("\n", s)
    s = _PY_MULTI_NL.sub("\n", s)
    return s.strip(TRIM_CHARS)


_PY_NUMREF = re.compile(NUMREF_RX)


def decode_numrefs_str(s: str) -> str:
    """Python twin of :func:`decode_numrefs_expr` (same sorted fold,
    same scalar-value guard)."""
    for r in sorted(set(_PY_NUMREF.findall(s))):
        body = r[2:-1]
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if _CP_MIN <= cp <= _CP_MAX and not (_SUR_LO <= cp <= _SUR_HI):
            s = s.replace(r, chr(cp))
    return s


def extract_text_str(s: str | None) -> str | None:
    """Per-row extraction contract (identical output to
    :func:`extract_text_expr`, byte for byte)."""
    if s is None:
        return None
    for cre in _PY_DROPS:
        s = cre.sub("", s)
    s = _PY_CDATA.sub("", s)
    s = _PY_COMMENT.sub("", s)
    s = _PY_BLOCK.sub("\n", s)
    s = _PY_ANY.sub("", s)
    for ent, ch in ENTITIES[:-1]:
        s = s.replace(ent, ch)
    s = decode_numrefs_str(s)
    s = s.replace(ENTITIES[-1][0], ENTITIES[-1][1])
    return ws_normalize_str(s)


# --- DuckDB oracle fragments (same constants, RE2 dialect) -----------------


def _sql_str(s: str) -> str:
    """SQL string literal for a pattern/replacement; newlines become
    chr(10) concatenation (DuckDB ordinary literals don't process
    backslash escapes, so regex backslashes pass through verbatim)."""
    parts = [p.replace("'", "''") for p in s.split("\n")]
    joined = " || chr(10) || ".join(f"'{p}'" for p in parts)
    # a leading/trailing newline produces an empty '' segment — harmless.
    return joined if joined else "''"


def decode_numrefs_sql(expr: str) -> str:
    """DuckDB twin of :func:`decode_numrefs_expr` — same sorted fold via
    list_reduce/list_prepend (the pii.py device); the codepoint comes
    from DuckDB's native hex-literal cast and decodes with its Unicode
    `chr()`."""
    digits = "regexp_replace(x, '[&#xX;]', '', 'g')"
    cp = (
        f"(CASE WHEN lower(substr(x, 3, 1)) = 'x' "
        f"THEN CAST('0x' || {digits} AS BIGINT) "
        f"ELSE CAST({digits} AS BIGINT) END)"
    )
    valid = (
        f"({cp} >= {_CP_MIN} AND {cp} <= {_CP_MAX} "
        f"AND NOT ({cp} >= {_SUR_LO} AND {cp} <= {_SUR_HI}))"
    )
    ch = f"(CASE WHEN {valid} THEN chr(CAST({cp} AS INT)) ELSE x END)"
    refs = (
        f"list_sort(list_distinct(regexp_extract_all({expr}, "
        f"{_sql_str(NUMREF_RX)}, 0)))"
    )
    return (
        f"list_reduce(list_prepend({expr}, {refs}), "
        f"(acc, x) -> replace(acc, x, {ch}))"
    )


def extract_text_sql(expr: str) -> str:
    """The same cascade as :func:`extract_text_expr`, as a DuckDB SQL
    expression over `expr` (RE2 'g' flag = Java's replace-all default)."""
    out = expr
    for tag in DROP_BLOCK_TAGS:
        out = f"regexp_replace({out}, {_sql_str(_drop_block_rx(tag))}, '', 'g')"
    out = f"regexp_replace({out}, {_sql_str(CDATA_RX)}, '', 'g')"
    out = f"regexp_replace({out}, {_sql_str(COMMENT_RX)}, '', 'g')"
    out = f"regexp_replace({out}, {_sql_str(BLOCK_TAG_RX)}, chr(10), 'g')"
    out = f"regexp_replace({out}, {_sql_str(ANY_TAG_RX)}, '', 'g')"
    for ent, ch in ENTITIES[:-1]:
        out = f"replace({out}, {_sql_str(ent)}, {_sql_str(ch)})"
    out = decode_numrefs_sql(out)
    out = (
        f"replace({out}, {_sql_str(ENTITIES[-1][0])}, {_sql_str(ENTITIES[-1][1])})"
    )
    return ws_normalize_sql(out)


def ws_normalize_sql(expr: str) -> str:
    out = f"regexp_replace({expr}, {_sql_str(WS_BLANKS_RX)}, ' ', 'g')"
    out = f"regexp_replace({out}, {_sql_str(WS_AROUND_NL_RX)}, chr(10), 'g')"
    out = f"regexp_replace({out}, {_sql_str(WS_MULTI_NL_RX)}, chr(10), 'g')"
    return f"trim({out}, ' ' || chr(10))"


def escape_text_sql(expr: str) -> str:
    out = f"replace({expr}, '&', '&amp;')"
    out = f"replace({out}, '<', '&lt;')"
    return f"replace({out}, '>', '&gt;')"


# ---------------------------------------------------------------------------
# Robots-meta extraction (round 5 — crawl-compliance signal)
# ---------------------------------------------------------------------------

# <meta name="robots" content="..."> in the fixed attribute order the
# fixtures synthesize; whitespace class spelled explicitly (the \s
# dialect trap — Java includes \x0B, RE2 does not).  Case-insensitive
# via (?i), supported identically in Java/`re`/RE2.
META_ROBOTS_RX = (
    r'(?i)<meta[ \t\n\r\f]+name="robots"[ \t\n\r\f]+content="([^"]*)"'
)


def robots_meta_expr(col: Column) -> list[Column]:
    """(robots_content, noindex, nofollow) from raw markup: the page-level
    crawl-compliance signal a pipeline must respect before a page enters
    the corpus.  Directive matching is substring-on-lowercase (covers
    'noindex,nofollow', spaced variants, and NONE which implies both per
    the robots spec — documented simplification: NONE handled, ALL is
    the absent-default).  Pure expressions riding the scan."""
    content = F.lower(F.regexp_extract(col, META_ROBOTS_RX, 1))
    noindex = F.contains(content, F.lit("noindex")) | F.contains(
        content, F.lit("none")
    )
    nofollow = F.contains(content, F.lit("nofollow")) | F.contains(
        content, F.lit("none")
    )
    return [
        content.alias("robots_content"),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
    ]


def robots_meta_sql(expr: str) -> list[str]:
    """DuckDB twin of `robots_meta_expr` (same pattern constant)."""
    content = f"lower(regexp_extract({expr}, {_sql_str(META_ROBOTS_RX)}, 1))"
    noindex = f"(contains({content}, 'noindex') OR contains({content}, 'none'))"
    nofollow = f"(contains({content}, 'nofollow') OR contains({content}, 'none'))"
    return [
        f"{content} AS robots_content",
        f"{noindex} AS noindex",
        f"{nofollow} AS nofollow",
    ]
