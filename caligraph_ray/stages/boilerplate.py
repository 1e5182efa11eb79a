"""Per-host boilerplate line removal (beyond the reference's operator set —
the JusText/Trafilatura-style cleanup every web-text training pipeline
applies: navigation/footer lines repeated across many pages of one host are
stripped before the text is used).

Scale shape (100 TB): explode → vectorized pandas split/explode, no Python
row loop; the boilerplate dimension is built with a two-phase count (partial
per batch, small merge) and is NOT broadcast — the join back is the
hash-partitioned ``shuffle_join`` because the union of per-host boilerplate
sets is itself dataset-sized at web scale; reassembly is one ``grouped_map``
keyed by doc (a document's lines co-locate by construction of the shuffle).
"""

from __future__ import annotations

import pandas as pd

from .relational import (grouped_map, shuffle_join, two_phase_count)

_SEP = '\x00'


def explode_lines(docs_ds, text_col: str = 'text', id_col: str = 'doc_id',
                  group_col: str = 'source'):
    """Docs → one row per line: (id, group, pos, line, n_lines)."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        parts = b[text_col].str.split('\n')
        out = b[[id_col, group_col]].copy()
        out['line'] = parts
        out['n_lines'] = parts.str.len()
        out = out.explode('line', ignore_index=True)
        out['pos'] = out.groupby(id_col).cumcount()
        return out

    return docs_ds.map_batches(explode, batch_format='pandas')


def boilerplate_lines(lines_ds, group_col: str = 'source',
                      id_col: str = 'doc_id', min_docs: int = 5):
    """(group, line) pairs appearing in ≥ min_docs distinct docs of that
    group. Distinctness is resolved per batch (a doc's lines never split
    across batches — explode_lines emits them together)."""
    deduped = lines_ds.map_batches(
        lambda b: b.drop_duplicates([id_col, group_col, 'line'])[
            [group_col, 'line']],
        batch_format='pandas')
    counts = two_phase_count(deduped, [group_col, 'line'], 'cnt')
    return counts.filter(lambda r: r['cnt'] >= min_docs)


def remove_boilerplate(docs_ds, text_col: str = 'text',
                       id_col: str = 'doc_id', group_col: str = 'source',
                       min_docs: int = 5):
    """Docs → (id, cleaned, n_removed): text with per-group boilerplate
    lines stripped, preserving the original line order."""
    lines = explode_lines(docs_ds, text_col, id_col, group_col)
    bp = boilerplate_lines(lines, group_col, id_col, min_docs)

    def key_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out['_bk'] = out[group_col] + _SEP + out['line'].astype(str)
        return out

    def key_right(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            '_bk': b[group_col] + _SEP + b['line'].astype(str),
            '_bp': 1})

    joined = shuffle_join(
        lines.map_batches(key_left, batch_format='pandas'),
        bp.map_batches(key_right, batch_format='pandas'),
        left_on='_bk', right_on='_bk', how='left')
    kept = joined.map_batches(
        lambda b: b[b['_bp'].isna()][[id_col, 'pos', 'line', 'n_lines']],
        batch_format='pandas')

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values('pos', kind='mergesort')
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            'cleaned': ['\n'.join(g['line'])],
            'n_removed': [int(g['n_lines'].iloc[0]) - len(g)],
        })

    return grouped_map(kept, [id_col], reassemble)
