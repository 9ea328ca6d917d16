"""Email-text parsing kit (SURVEY.md §2.D) — pure column expressions
re-expressing the reference's provider-side parsing
(ref: src/providers/gmail/provider.py:227-369):

- address parsing (parseaddr): '"Ada L" <ada@ex.com>' → (name, email)
- recipient-list splitting (ref: provider.py:290-301)
- domain extraction (ref: pattern analysis group_by=domain,
  src/api/mcp_tools.py:218-222)
- HTML → text stripping incl. script/style and 1x1 tracking pixels
  (ref: provider.py:352-369)
- sanitized filename / slug (ref: src/security.py:214-229)

All JVM-side regex — no Python in the hot path; a 100 TB corpus pass
is a single scan-project stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC-ish mailbox: optional display name, then <addr> or bare addr
_ADDR_IN_ANGLES = "<([^<>]+@[^<>]+)>"
_BARE_ADDR = "([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+)"


def addr_email(col: Column) -> Column:
    """The address part of a mailbox string (parseaddr()[1] analog)."""
    in_angles = F.regexp_extract(col, _ADDR_IN_ANGLES, 1)
    bare = F.regexp_extract(col, _BARE_ADDR, 1)
    return F.lower(F.trim(F.when(in_angles != "", in_angles).otherwise(bare)))


def addr_name(col: Column) -> Column:
    """The display-name part (parseaddr()[0] analog), unquoted."""
    raw = F.regexp_extract(col, r"^\s*(.*?)\s*<[^<>]+>\s*$", 1)
    return F.regexp_replace(raw, "^\"|\"$", "")


def split_recipients(col: Column) -> Column:
    """Comma-separated recipient string → array of addresses."""
    parts = F.split(col, ",")
    emails = F.transform(parts, addr_email)
    return F.filter(emails, lambda e: e != "")


def email_domain(col: Column) -> Column:
    """Domain of an address ('user@corp.com' → 'corp.com')."""
    return F.lower(F.regexp_extract(col, "@([A-Za-z0-9.-]+)$", 1))


def html_to_text(col: Column) -> Column:
    """Strip HTML to plain text: drop script/style subtrees and 1x1
    tracking pixels, remove tags, decode common entities, collapse
    whitespace."""
    s = F.regexp_replace(col, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    s = F.regexp_replace(s, "(?i)<img[^>]*(width|height)=[\"']?1[\"']?[^>]*>", " ")
    s = F.regexp_replace(s, "(?i)<br\\s*/?>|</p>|</div>|</tr>", "\n")
    s = F.regexp_replace(s, "<[^>]+>", " ")
    for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
        s = F.regexp_replace(s, ent, rep)
    s = F.regexp_replace(s, "[ \\t]+", " ")
    s = F.regexp_replace(s, "\\s*\\n\\s*", "\n")
    return F.trim(s)


# ---------------------------------------------------------------------------
# HTML → markdown (ref: provider.py:17,352 converts HTML bodies with
# html2text; plain tag-stripping loses links/headers/lists). One rule
# table drives BOTH engines — the Spark column chain and the DuckDB
# oracle SQL — so the conversion rules themselves are hash-checked
# cross-engine, not just eyeballed. Patterns are the RE2-compatible
# subset of Java regex (no backreferences: script/style are separate
# rules), replacements differ only in group syntax ($1 vs \1).
# Rule order matters: subtree drops first, inline marks (b/i/code)
# before links so nested '<a><b>x</b></a>' becomes '[**x**](u)',
# structure tags before the generic tag strip.
# ---------------------------------------------------------------------------

_NL = "\n"
_MD_RULES: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # 1x1 tracking pixels drop entirely; real images keep their src
    (r"""(?i)<img[^>]*(width|height)=["']?1["']?[^>]*>""", " "),
    (r"""(?is)<img[^>]*src=["']([^"']*)["'][^>]*/?>""", "![]($1)"),
    # (?:\s[^>]*)? after each tag name: '<b ...>' or '<b>' but never
    # '<body>' / '<img>' / '<link>' swallowed by a shorter tag's rule
    (r"(?is)<h1(?:\s[^>]*)?>(.*?)</h1>", _NL + "# $1" + _NL),
    (r"(?is)<h2(?:\s[^>]*)?>(.*?)</h2>", _NL + "## $1" + _NL),
    (r"(?is)<h3(?:\s[^>]*)?>(.*?)</h3>", _NL + "### $1" + _NL),
    (r"(?is)<h4(?:\s[^>]*)?>(.*?)</h4>", _NL + "#### $1" + _NL),
    (r"(?is)<h5(?:\s[^>]*)?>(.*?)</h5>", _NL + "##### $1" + _NL),
    (r"(?is)<h6(?:\s[^>]*)?>(.*?)</h6>", _NL + "###### $1" + _NL),
    (r"(?is)<(?:b|strong)(?:\s[^>]*)?>(.*?)</(?:b|strong)>", "**$1**"),
    (r"(?is)<(?:i|em)(?:\s[^>]*)?>(.*?)</(?:i|em)>", "*$1*"),
    (r"(?is)<code(?:\s[^>]*)?>(.*?)</code>", "`$1`"),
    (r"""(?is)<a\s[^>]*href=["']([^"']*)["'][^>]*>(.*?)</a>""", "[$2]($1)"),
    (r"(?is)<li(?:\s[^>]*)?>(.*?)</li>", _NL + "- $1"),
    (r"(?is)<blockquote(?:\s[^>]*)?>(.*?)</blockquote>", _NL + "> $1" + _NL),
    (r"(?i)<hr[^>]*/?>", _NL + "---" + _NL),
    (r"(?i)<br[^>]*/?>|</p>|</div>|</tr>|</ul>|</ol>|</table>", _NL),
    (r"<[^>]+>", " "),
]
_MD_ENTITIES = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
)


def html_to_markdown(col: Column) -> Column:
    """HTML → structure-preserving markdown (headers, links, images,
    bold/italic/code, lists, rules) — html2text-fidelity analog of
    html_to_text, still a pure JVM regex chain: a 100 TB body pass is
    one scan-project stage with zero Python."""
    s = col
    for pat, rep in _MD_RULES:
        s = F.regexp_replace(s, pat, rep)
    for ent, rep in _MD_ENTITIES:
        s = F.regexp_replace(s, ent, rep)
    s = F.regexp_replace(s, "[ \\t]+", " ")
    s = F.regexp_replace(s, " ?\\n ?", "\n")
    s = F.regexp_replace(s, "\\n{3,}", "\n\n")
    # regex trim, not F.trim: trim() strips spaces only, and the edge
    # whitespace here includes newlines from structural rules
    return F.regexp_replace(s, "^\\s+|\\s+$", "")


def html_to_markdown_sql(expr: str) -> str:
    """The DuckDB twin of html_to_markdown, generated from the SAME
    rule table (group refs translated $1 → \\1), so an oracle can
    hash-check the conversion rules cross-engine."""
    s = expr
    for pat, rep in _MD_RULES:
        duck_rep = rep.replace("$1", "\\1").replace("$2", "\\2")
        s = _duck_rr(s, pat, duck_rep)
    for ent, rep in _MD_ENTITIES:
        s = _duck_rr(s, ent, rep)
    s = _duck_rr(s, "[ \\t]+", " ")
    s = _duck_rr(s, " ?\\n ?", chr(10))
    s = _duck_rr(s, "\\n{3,}", chr(10) * 2)
    return _duck_rr(s, "^\\s+|\\s+$", "")


def _duck_rr(inner: str, pat: str, rep: str) -> str:
    q_pat = pat.replace("'", "''")
    q_rep = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
    # 'g' only — dotall/case flags live inline in each pattern, so both
    # engines see exactly the same flag set per rule.
    return f"regexp_replace({inner}, '{q_pat}', '{q_rep}', 'g')"


def sanitize_filename(col: Column) -> Column:
    """Safe attachment filename (ref: src/security.py:214-229): strip
    path components, keep [A-Za-z0-9.-_], force a .txt extension for
    dangerous ones."""
    base = F.element_at(F.split(col, "[/\\\\]"), -1)
    safe = F.regexp_replace(base, "[^A-Za-z0-9.\\-_]", "_")
    dangerous = (
        "(?i)\\.(exe|com|bat|cmd|scr|vbs|vbe|js|jse|wsf|wsh|msi|jar|app"
        "|dmg|pkg|deb|rpm|sh|bash|ps1|psm1|reg|dll|so|dylib)$"
    )
    return F.when(
        F.regexp_count(safe, F.lit(dangerous)) > 0,
        F.concat(F.regexp_replace(safe, "\\.[^.]*$", ""), F.lit(".txt")),
    ).otherwise(safe)


def parse_rfc_date(col: Column) -> Column:
    """Parse 'Tue, 15 Jul 2025 10:30:00 +0000'-style Date headers
    (ref: provider.py:245-258), falling back to ISO. The weekday is
    stripped first: Spark's post-3.0 datetime parser has no pattern
    for parsing day-of-week names."""
    no_dow = F.regexp_replace(F.trim(col), "^[A-Za-z]{3},\\s*", "")
    rfc = F.to_timestamp(no_dow, "d MMM yyyy HH:mm:ss Z")
    iso = F.to_timestamp(col)
    return F.coalesce(rfc, iso)
