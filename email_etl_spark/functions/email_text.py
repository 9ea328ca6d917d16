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
