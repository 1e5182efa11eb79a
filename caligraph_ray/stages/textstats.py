"""Text-analysis operators over the documents table (SURVEY.md additions:
language-ID, quality scoring, token counting, fingerprinting, plus the
reference's surface-form / hypernym count aggregations A1/A2/A13).

All stages are two-phase: vectorized or dict-combined per batch, then a
small groupby over partials — a head token ('the') never travels as raw
rows through the shuffle.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional

import pandas as pd
import pyarrow as pa

from ..config import AGG_BATCH_SIZE
from ..functions.hashing import rolling_fingerprint

# deterministic English function-word list for the lang-ID heuristic
EN_STOPWORDS = frozenset({'the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'it', 'for'})


def _split_tokens(text: str) -> List[str]:
    return [t for t in text.split(' ') if t]


def token_counts(docs_ds, text_col: str = 'text', min_len: int = 0,
                 vocab: Optional[frozenset] = None):
    """(token, freq) via per-batch Counter combine + groupby sum (A2/A13)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column(text_col).to_pylist():
            for t in _split_tokens(text):
                if len(t) >= min_len and (vocab is None or t in vocab):
                    c[t] += 1
        return pa.Table.from_pydict({'token': list(c.keys()),
                                     'cnt': pa.array(list(c.values()), pa.int64())})

    pre = docs_ds.map_batches(partial, batch_format='pyarrow', batch_size=AGG_BATCH_SIZE)
    return pre.groupby('token').aggregate(Sum('cnt', alias_name='freq'))


def bigram_counts(docs_ds, text_col: str = 'text'):
    """(w1, w2, freq) adjacent-pair counts (A1 hypernym-pair analogue)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column(text_col).to_pylist():
            toks = _split_tokens(text)
            for i in range(len(toks) - 1):
                c[(toks[i], toks[i + 1])] += 1
        w1 = [k[0] for k in c]
        w2 = [k[1] for k in c]
        return pa.Table.from_pydict({'w1': w1, 'w2': w2,
                                     'cnt': pa.array(list(c.values()), pa.int64())})

    pre = docs_ds.map_batches(partial, batch_format='pyarrow', batch_size=AGG_BATCH_SIZE)
    return pre.groupby(['w1', 'w2']).aggregate(Sum('cnt', alias_name='freq'))


def quality_scores(docs_ds, id_col: str = 'doc_id', text_col: str = 'text'):
    """Per-doc quality metrics: token count, distinct tokens, mean token
    length, stopword ratio (rounded 6dp for cross-engine comparability)."""
    def score(batch: pd.DataFrame) -> pd.DataFrame:
        n_tokens, n_uniq, avg_len, stop_ratio = [], [], [], []
        for text in batch[text_col]:
            toks = _split_tokens(text)
            n = len(toks)
            n_tokens.append(n)
            n_uniq.append(len(set(toks)))
            avg_len.append(round(sum(map(len, toks)) / n, 6) if n else 0.0)
            stop_ratio.append(round(sum(t in EN_STOPWORDS for t in toks) / n, 6) if n else 0.0)
        return pd.DataFrame({id_col: batch[id_col], 'n_tokens': n_tokens,
                             'n_uniq_tokens': n_uniq, 'avg_token_len': avg_len,
                             'stopword_ratio': stop_ratio})
    return docs_ds.map_batches(score, batch_format='pandas', batch_size=AGG_BATCH_SIZE)


def lang_id(docs_ds, id_col: str = 'doc_id', text_col: str = 'text',
            threshold: float = 0.05):
    """Heuristic language ID: English function-word ratio ≥ threshold → 'en'
    (n-gram-free deterministic stand-in; the actor-pool shape matches a real
    fastText-style model stage)."""
    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch[text_col]:
            toks = _split_tokens(text)
            ratio = (sum(t in EN_STOPWORDS for t in toks) / len(toks)) if toks else 0.0
            preds.append('en' if ratio >= threshold else 'unknown')
        return pd.DataFrame({id_col: batch[id_col], 'pred_lang': preds})
    return docs_ds.map_batches(classify, batch_format='pandas', batch_size=AGG_BATCH_SIZE)


def fingerprints(docs_ds, id_col: str = 'doc_id', text_col: str = 'text',
                 window: int = 16, keep: int = 8, hash_fn=None):
    """Winnowing-style rolling-hash document fingerprints. Pass
    ``hash_fn=md5_hash64`` for DuckDB-checkable signatures."""
    from ..functions.hashing import stable_hash64
    hf = hash_fn or stable_hash64

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        out = [rolling_fingerprint(t, window, keep, hash_fn=hf)
               for t in batch[text_col]]
        return pd.DataFrame({id_col: batch[id_col], 'fingerprint': out})
    return docs_ds.map_batches(fp, batch_format='pandas', batch_size=AGG_BATCH_SIZE)


# BPE-style pretokenizer (ASCII simplification of the published GPT-2
# pattern — contractions, letter runs, digit runs, symbol runs, each with an
# optional leading space; RE2-compatible so the DuckDB oracle can recount)
BPE_PRETOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"
_BPE_RE = None


def bpe_pretoken_count(text: str) -> int:
    global _BPE_RE
    if _BPE_RE is None:
        import re
        _BPE_RE = re.compile(BPE_PRETOKEN_PATTERN)
    return len(_BPE_RE.findall(text))


def bpe_token_counts(docs_ds, id_col: str = 'doc_id', text_col: str = 'text'):
    """Per-document BPE-ish pretoken count (the training-data token-budget
    signal; whitespace counts come from token_counts/quality scoring)."""
    import pandas as pd

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: batch[id_col],
                             'n_pretokens': [bpe_pretoken_count(t)
                                             for t in batch[text_col]]})

    return docs_ds.map_batches(count, batch_format='pandas',
                               batch_size=AGG_BATCH_SIZE)
