"""PII scrubbing for web-scale training corpora (beyond the reference's
operator set — standard Common-Crawl pipeline hygiene, e.g. the C4 /
Dolma-style redaction passes).

Streaming shape: one vectorized ``map_batches`` over pandas batches —
``Series.str.count`` / ``Series.str.replace`` run the compiled regex per
column, never per Python row. Patterns are RE2-compatible (no lookaround,
no backrefs) so a DuckDB ``regexp_extract_all`` / ``regexp_replace``
replay gates the semantics exactly.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd

# (name, pattern, replacement token) — applied in order; patterns are
# disjoint on any sane text (an email is never inside a phone match).
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ('email', r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", '[EMAIL]'),
    ('phone', r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", '[PHONE]'),
    ('ip', r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", '[IP]'),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def scrub_text(text: str) -> Tuple[str, dict]:
    """Single-string reference implementation (tests / oracles): counts on
    the original text, then sequential replacement."""
    counts = {f'n_{name}': len(rx.findall(text)) for name, rx, _ in _COMPILED}
    for _, rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    return text, counts


def scrub_pii(ds, text_col: str = 'text', out_col: str = 'scrubbed'):
    """Dataset → same rows + ``out_col`` (redacted text) + per-category
    match counts (``n_email``/``n_phone``/``n_ip``, counted on the
    original text). Pure streaming map — no shuffle, no state."""

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        # .str ops propagate NULL; astype(str) would rewrite NULL text as
        # the literal string 'None' in the scrubbed column (and diverge
        # from a DuckDB regexp_replace replay, which keeps NULL)
        s = batch[text_col]
        out = batch.copy()
        scrubbed = s
        for name, rx, repl in _COMPILED:
            out[f'n_{name}'] = s.str.count(rx).fillna(0).astype('int64')
            scrubbed = scrubbed.str.replace(rx, repl, regex=True)
        out[out_col] = scrubbed
        return out

    return ds.map_batches(scrub, batch_format='pandas')
