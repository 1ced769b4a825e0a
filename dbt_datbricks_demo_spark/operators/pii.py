"""PII detection and redaction over text columns.

A large-scale training corpus is scrubbed of obvious personally
identifiable information before use; this module implements the
detector/redactor as pure JVM regexp expressions — a single narrow scan,
zero shuffles, zero Python, so at 100 TB the cost is scan throughput.

Pattern dialect is deliberately restricted to the intersection of Java
regex (Spark) and RE2 (DuckDB/Go scanners): character classes, bounded
repetition, alternation — no backreferences, no lookaround — so the
exact same patterns run in any engine an oracle or a downstream scrubber
might use.

Redaction order matters where patterns overlap on digits: emails first
(may contain digits/dots), then IPv4 (dotted digits would otherwise be
eaten as phone fragments), then SSN (3-2-4 digits), then phone (which
would match an SSN's 3-digit prefix if run earlier).

Reference parity: not in the reference (IoT demo); part of the
training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

# (name, pattern, placeholder) in redaction precedence order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ipv4", IPV4_RE, "[IP]"),
    ("ssn", SSN_RE, "[SSN]"),
    ("phone", PHONE_RE, "[PHONE]"),
]


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Occurrence count per PII class, counted on the RAW text (before
    any redaction), so overlapping classes each report their own view."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its class placeholder, applied in
    PII_PATTERNS precedence order (each replace feeds the next)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pat, placeholder)
    return c


def residual_pii_count(col: Column | str) -> Column:
    """Total PII matches remaining in a (presumably redacted) text —
    the scrub-verification metric; 0 on correctly redacted output."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0)
    for _, pat, _ in PII_PATTERNS:
        out = out + F.regexp_count(c, F.lit(pat))
    return out


def pii_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII audit: counts per class, redacted text, and the
    residual count after redaction (0 proves the scrub)."""
    counts = pii_counts(text_col)
    redacted = redact_pii(text_col)
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        redacted.alias("redacted_text"),
        residual_pii_count(redacted).alias("n_residual"),
    )


# ---------------------------------------------------------------------------
# Column-tag-driven masking (governance layer)
# ---------------------------------------------------------------------------
# Databricks/Unity-style column masking re-expressed engine-side: a
# model declares per-column sensitivity tags; masked_view applies the
# matching mask expression and returns a DataFrame safe to expose as a
# view. Masking is a narrow projection — zero shuffles, free at scale.

MASKS = {
    # scrub PII classes inside free text
    "pii_text": lambda c, salt: redact_pii(c),
    # keyed pseudonymous join key: sha2(salt || value) keeps equality
    # semantics within one salt while a brute-force dictionary over a
    # guessable domain (phones, emails, sequential ids) is useless
    # without the salt. NOT irreversible for the salt holder — this is
    # linkable pseudonymization, not anonymization.
    "pseudonymize": lambda c, salt: F.sha2(
        F.concat(F.lit(salt), c.cast("string")), 256
    ),
    # drop the value entirely, keep the column shape
    "redact_full": lambda c, salt: F.lit("[REDACTED]"),
    # keep only the last 4 characters (card/phone-tail style)
    "mask_prefix": lambda c, salt: F.concat(
        F.lit("****"), F.substring(c.cast("string"), -4, 4)
    ),
}


def masked_view(
    df: DataFrame, tags: dict[str, str], salt: str = ""
) -> DataFrame:
    """Apply per-column masks by tag: ``tags`` maps column name → mask
    name from MASKS. Untagged columns pass through; unknown tags or
    columns raise immediately (a silent no-op mask is a data leak).

    ``salt`` keys the ``pseudonymize`` mask (inject a per-deployment
    secret from config); the default empty salt degrades to unsalted
    hashing and should only be used where linkability is acceptable."""
    unknown_cols = [c for c in tags if c not in df.columns]
    if unknown_cols:
        raise ValueError(f"masked_view: no such columns {unknown_cols}")
    unknown_tags = [t for t in tags.values() if t not in MASKS]
    if unknown_tags:
        raise ValueError(
            f"masked_view: unknown mask tags {unknown_tags}; "
            f"available: {sorted(MASKS)}"
        )
    return df.select(
        *[
            MASKS[tags[c]](F.col(c), salt).alias(c) if c in tags else F.col(c)
            for c in df.columns
        ]
    )
