"""Vectorized PII detection / redaction over a text column.

Training corpora scraped from the web carry emails, phone numbers and
bare IP addresses that must be scrubbed before the data is usable.
This stage runs entirely on Arrow RE2 kernels
(``pc.count_substring_regex`` + ``pc.replace_substring_regex``) — no
Python touches a row, so a block is one C++ pass per pattern — and the
patterns avoid RE2-unsupported constructs (no lookaround) so the exact
same expressions run under DuckDB's RE2 ``regexp_replace`` for the
value-hash oracle.

Beyond-reference training-pipeline operator (the docling-graph
reference extracts entities; it has no corpus-scrubbing pass).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (name, pattern, replacement) — applied in order; order matters only
#: when patterns overlap (emails contain dots but are redacted before
#: the IP pattern can see their digits).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_batch(text_col: str = "text", out_col: str = "redacted"):
    """Batch fn: append per-category match counts + the redacted text.

    Counts are taken against the ORIGINAL text (so ``n_ip`` counts real
    IPs even when an email was redacted first); replacement is applied
    sequentially in ``PII_PATTERNS`` order.
    """

    def fn(batch: pa.Table) -> pa.Table:
        src = batch.column(text_col)
        out = src
        for name, pat, rep in PII_PATTERNS:
            batch = batch.append_column(
                f"n_{name}",
                pc.count_substring_regex(src, pattern=pat).cast(pa.int64()),
            )
            out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
        return batch.append_column(out_col, out)

    return fn
