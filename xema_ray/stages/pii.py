"""PII scrubbing — vectorized detection + redaction of personally
identifiable substrings (emails, SSN-shaped ids, phone numbers, IPv4
addresses) over a text column, a standard compliance pass in
training-data pipelines (SURVEY.md §2 "beyond the reference").

Pure ``map_batches``: every pattern runs as one RE2 kernel over the
whole batch (``count_substring_regex`` + ``replace_substring_regex``) —
no per-row Python, no state, no shuffle.  DuckDB's regex engine is also
RE2, so a SQL oracle recomputes the identical counts and scrubbed text
with chained ``regexp_replace(..., 'g')``.

Patterns are deliberately RE2-safe (no backreferences/lookaround) and
applied in a FIXED order, each over the output of the previous
replacement — order matters (an email contains digit runs a phone
pattern could otherwise nibble), and the SQL oracle chains its CTEs in
the same order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (name, RE2 pattern, replacement marker) — applied in this order.
DEFAULT_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def scrub_batch(tbl: pa.Table, text_col: str = "text",
                patterns=DEFAULT_PII_PATTERNS,
                out_col: str = "scrubbed") -> pa.Table:
    """Append per-pattern match counts (``n_<name>``, int64) and the
    fully redacted text (``out_col``).  Counts are taken on the text as
    it stands when that pattern runs (chained semantics)."""
    text = pc.fill_null(pc.cast(tbl[text_col], pa.string()), "")
    out = tbl
    for name, pattern, marker in patterns:
        counts = pc.cast(
            pc.count_substring_regex(text, pattern=pattern), pa.int64())
        text = pc.replace_substring_regex(
            text, pattern=pattern, replacement=marker)
        out = out.append_column(f"n_{name}", counts)
    return out.append_column(out_col, text)


def pii_scrub(ds, text_col: str = "text", patterns=DEFAULT_PII_PATTERNS,
              out_col: str = "scrubbed"):
    """Dataset → dataset with redacted text + per-pattern counts.
    Streaming, stateless, shuffle-free — at 100 TB this is bounded by
    regex throughput alone (RE2 scans, one pass per pattern)."""
    return ds.map_batches(
        lambda t: scrub_batch(t, text_col=text_col, patterns=patterns,
                              out_col=out_col),
        batch_format="pyarrow",
    )
