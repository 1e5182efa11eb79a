"""Per-host boilerplate line removal (beyond the reference's operator set —
the JusText/Trafilatura-style cleanup every web-text training pipeline
applies: navigation/footer lines repeated across many pages of one host are
stripped before the text is used).

Scale shape (100 TB): the boilerplate dimension is built with a two-phase
count (vectorized per-batch explode → partial counts; only the partials are
exchanged, never the raw line table) and is NOT broadcast — the union of
per-host boilerplate sets is itself dataset-sized at web scale. Removal is
ONE salted exchange: documents are keyed by ``(host, salt)`` where
``salt = hash(doc_id) % k``, and the (small-per-host) boilerplate dim is
replicated into each of the k salt sub-buckets — the classic skew-join
treatment (spread the probe side, duplicate the build side), so a megahost
holding half the corpus still splits across k tasks. Inside a bucket the
anti-join + reassembly is pure vectorized pandas (split / explode / isin /
groupby-join), and a document's lines never cross tasks because the doc
travels whole. The text payload moves over the wire exactly once.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc

from .relational import (arrow_filter, bucketed_map, two_phase_count)

_SEP = '\x00'


def boilerplate_lines(docs_ds, group_col: str = 'source',
                      id_col: str = 'doc_id', min_docs: int = 5,
                      text_col: str = 'text'):
    """(group, line) pairs appearing in ≥ min_docs distinct docs of that
    group. Explode AND per-doc dedup happen inside ONE map UDF over whole
    documents, so per-doc distinctness never depends on where Ray splits
    output blocks — a doc contributes each (group, line) at most once by
    construction (count(DISTINCT doc) exactly)."""
    def distinct_doc_lines(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col, group_col]].copy()
        out['line'] = b[text_col].str.split('\n')
        out = out.explode('line', ignore_index=True)
        out = out[out['line'].notna()]   # NULL-text docs contribute no lines
        return out.drop_duplicates([id_col, group_col, 'line'])[
            [group_col, 'line']]

    deduped = docs_ds.map_batches(distinct_doc_lines, batch_format='pandas')
    counts = two_phase_count(deduped, [group_col, 'line'], 'cnt')
    return arrow_filter(counts,
                        lambda t: pc.greater_equal(t['cnt'], min_docs))


def remove_boilerplate(docs_ds, text_col: str = 'text',
                       id_col: str = 'doc_id', group_col: str = 'source',
                       min_docs: int = 5, salt_buckets: int = 8):
    """Docs → (id, cleaned, n_removed): text with per-group boilerplate
    lines stripped, preserving the original line order. Documents whose
    every line is boilerplate are dropped (nothing left to emit), matching
    the anti-join + group-by SQL shape.

    ONE exchange: docs salted on ``(group, hash(id) % salt_buckets)``, the
    boilerplate dim replicated into each salt sub-bucket (see module doc)."""
    bp = boilerplate_lines(docs_ds, group_col, id_col, min_docs, text_col)
    id_kind = str(dict(zip(docs_ds.schema().names,
                           docs_ds.schema().types))[id_col])

    # transit schema is all-string so the doc and dim sides union cleanly;
    # the id is cast back to its source dtype after the exchange
    def salt_docs(b: pd.DataFrame) -> pd.DataFrame:
        # NULL text = no lines: the doc drops out (the SQL unnest shape);
        # kept in, its NaN line would TypeError the whole bucket's join
        b = b[b[text_col].notna()]
        salt = (pd.util.hash_pandas_object(b[id_col], index=False)
                % salt_buckets).astype(str)
        return pd.DataFrame({
            '_id': b[id_col].astype(str), group_col: b[group_col],
            text_col: b[text_col], 'line': '',
            '_bk': b[group_col] + _SEP + salt, '_side': 'd'})

    def replicate_dim(b: pd.DataFrame) -> pd.DataFrame:
        reps = []
        for s in range(salt_buckets):
            reps.append(pd.DataFrame({
                '_id': '', group_col: b[group_col],
                text_col: '', 'line': b['line'],
                '_bk': b[group_col] + _SEP + str(s), '_side': 'b'}))
        return pd.concat(reps, ignore_index=True)

    tagged = docs_ds.map_batches(salt_docs, batch_format='pandas').union(
        bp.map_batches(replicate_dim, batch_format='pandas'))

    def clean_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({'_id': pd.Series([], dtype=object),
                              'cleaned': pd.Series([], dtype=object),
                              'n_removed': pd.Series([], dtype='int64')})
        docs = g[g['_side'] == 'd']
        if docs.empty:
            return empty
        dim = g[g['_side'] == 'b']
        bad = set(dim[group_col] + _SEP + dim['line']) if len(dim) else set()
        parts = docs[text_col].str.split('\n')
        ex = pd.DataFrame({'_id': docs['_id'], group_col: docs[group_col]})
        ex['line'] = parts
        ex = ex.explode('line', ignore_index=True)
        n_lines = parts.str.len().set_axis(docs['_id']).rename('n_lines')
        # explode preserves (doc, line-position) order, so no sort is needed
        kept = ex[~(ex[group_col] + _SEP + ex['line']).isin(bad)]
        if kept.empty:
            return empty
        agg = kept.groupby('_id', sort=False)['line'] \
            .agg(cleaned='\n'.join, n_kept='size').reset_index()
        agg = agg.merge(n_lines, left_on='_id', right_index=True)
        agg['n_removed'] = (agg['n_lines'] - agg['n_kept']).astype('int64')
        return agg[['_id', 'cleaned', 'n_removed']]

    cleaned = bucketed_map(tagged, ['_bk'], clean_bucket)

    def restore_id(b: pd.DataFrame) -> pd.DataFrame:
        out = b.rename(columns={'_id': id_col})
        if id_kind.startswith('int'):
            out[id_col] = out[id_col].astype('int64')
        return out

    return cleaned.map_batches(restore_id, batch_format='pandas')
