"""Listing-rule mining: derive new types/relations from listing context
(reference impl/listing/extract.py:22-299, A6/A7 + context table J2).

Semantics (two-level aggregation, extract.py:90-147):
  * context rows: one per subject entity occurrence —
    (page_id, page_type, topsection, section, entity, …)
  * level 1: per (rule_key, page): share of subject entities carrying the
    target (a type, or a relation to the page entity)
  * level 2: per rule_key: mean share over pages + page count → a rule fires
    when mean ≥ threshold and pages ≥ min_pages (reference thresholds from
    config.yaml listing.*)
  * application: subject entities inside matching listings that LACK the
    target get it asserted (anti-join against existing facts,
    extract.py:286-289 — broadcast key set, no shuffle).

Page-type dim and entity facts are broadcast small sides (ray.put once).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import AGG_BATCH_SIZE
from .relational import bucketed_map, two_phase_pandas_agg

RULE_KEY = ['page_type', 'topsection', 'section']


def aggregate_entity_facts(facts_ds):
    """facts (subj, pred, obj, is_literal) → one row per subj:
    (subj, types: list, props: list of [pred, obj]) — the per-entity fact
    dim as a DATASET (never a driver dict), built with one keyed shuffle."""
    from .relational import bucketed_map

    def agg(bucket: pd.DataFrame) -> pd.DataFrame:
        t = bucket[bucket['pred'] == 'rdf:type']
        p = bucket[(bucket['pred'] != 'rdf:type') & (~bucket['is_literal'].astype(bool))]
        types = t.groupby('subj', sort=False)['obj'].agg(lambda s: sorted(s))
        props = p.groupby('subj', sort=False)[['pred', 'obj']].apply(
            lambda g: sorted([a, b] for a, b in zip(g['pred'], g['obj'])))
        subjects = sorted(set(bucket['subj']))
        return pd.DataFrame({
            'subj': subjects,
            'types': [list(types.get(s, [])) for s in subjects],
            'props': [list(props.get(s, [])) for s in subjects],
        })

    return bucketed_map(facts_ds, ['subj'], agg)


def build_context(subjects_ds, page_type_fn=None, facts_ref=None, facts_ds=None):
    """subject-entity rows (url, page_id, topsection, section, entity) →
    context rows + per-entity target flags.

    ``page_type_fn(url) → str`` classifies pages (the reference uses page
    types from the taxonomy; default: leading word of the page title).
    Entity facts come from ONE of:
    * ``facts_ds`` — facts Dataset, combined via a co-partitioned hash join
      (the scale path: nothing driver-side), or
    * ``facts_ref`` — ray.put'd (types_by_ent, props_by_ent) dicts (fine
      while the per-entity dim fits the broadcast budget)."""
    if page_type_fn is None:
        def page_type_fn(url):
            title = url.rsplit('/', 1)[-1].replace('_', ' ')
            return title.split(' ')[0] if title else ''

    if facts_ds is not None:
        from .relational import shuffle_join
        facts_agg = aggregate_entity_facts(facts_ds)
        joined = shuffle_join(subjects_ds, facts_agg, 'entity', 'subj', how='left')

        def ctx_joined(batch: pd.DataFrame) -> pd.DataFrame:
            titles = [u.rsplit('/', 1)[-1].replace('_', ' ') for u in batch['url']]
            out = batch[['url', 'page_id', 'topsection', 'section', 'entity']].copy()
            out['page_type'] = [page_type_fn(u) for u in batch['url']]
            out['page_entity'] = titles
            out['ent_types'] = [sorted(t) if isinstance(t, (list, np.ndarray)) else []
                                for t in batch['types']]
            out['rels_to_page'] = [
                sorted(p for (p, v) in pr if v == title)
                if isinstance(pr, (list, np.ndarray)) else []
                for pr, title in zip(batch['props'], titles)]
            return out

        return joined.map_batches(ctx_joined, batch_format='pandas',
                                  batch_size=AGG_BATCH_SIZE)

    def ctx(batch: pd.DataFrame) -> pd.DataFrame:
        tbe, pbe = ray.get(facts_ref) if facts_ref is not None else ({}, {})
        page_types, page_ents = [], []
        types_l, rel_to_page = [], []
        for url, ent in zip(batch['url'], batch['entity']):
            title = url.rsplit('/', 1)[-1].replace('_', ' ')
            page_types.append(page_type_fn(url))
            page_ents.append(title)
            types_l.append(sorted(tbe.get(ent, ())) if ent else [])
            rel_to_page.append(sorted(p for (p, v) in pbe.get(ent, ()) if v == title)
                               if ent else [])
        out = batch[['url', 'page_id', 'topsection', 'section', 'entity']].copy()
        out['page_type'] = page_types
        out['page_entity'] = page_ents
        out['ent_types'] = types_l
        out['rels_to_page'] = rel_to_page
        return out

    return subjects_ds.map_batches(ctx, batch_format='pandas', batch_size=AGG_BATCH_SIZE)


def _mine(ctx_ds, target_col: str, mean_threshold: float, min_pages: int):
    """Shared two-level miner over a list-valued target column."""
    # per (rule_key, page, target): hits; per (rule_key, page): total subjects
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tot: Dict[tuple, int] = defaultdict(int)
        hit: Dict[tuple, int] = defaultdict(int)
        for _, r in batch.iterrows():
            k = (r['page_type'], r['topsection'], r['section'], r['page_id'])
            tot[k] += 1
            for t in r[target_col]:
                hit[k + (t,)] += 1
        rows = []
        for k, n in tot.items():
            rows.append(k + ('', n, 0))
        for k, n in hit.items():
            rows.append(k + (0, n))
        return pd.DataFrame(rows, columns=RULE_KEY + ['page_id', 'target', 'n_total', 'n_hit'])

    partials = ctx_ds.map_batches(partial, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
    per_page = two_phase_pandas_agg(
        partials, RULE_KEY + ['page_id', 'target'],
        {'n_total': ('n_total', 'sum'), 'n_hit': ('n_hit', 'sum')})

    # level 2: join target rows with their page totals, mean share per rule
    def level2(bucket: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for key, g in bucket.groupby(RULE_KEY, sort=False):
            totals = g[g['target'] == ''].set_index('page_id')['n_total']
            tg = g[g['target'] != '']
            if tg.empty:
                continue
            for target, tgg in tg.groupby('target', sort=False):
                shares = []
                for pid in totals.index:
                    hits = tgg[tgg['page_id'] == pid]['n_hit'].sum()
                    shares.append(hits / totals[pid] if totals[pid] else 0.0)
                mean_share = float(np.mean(shares)) if shares else 0.0
                n_pages = int((tgg['n_hit'] > 0).sum())
                if mean_share >= mean_threshold and n_pages >= min_pages:
                    out_rows.append(dict(zip(RULE_KEY, key)) |
                                    {'target': target,
                                     'mean_share': round(mean_share, 6),
                                     'n_pages': n_pages})
        cols = RULE_KEY + ['target', 'mean_share', 'n_pages']
        return pd.DataFrame(out_rows, columns=cols)

    return bucketed_map(per_page, RULE_KEY, level2)


def mine_type_rules(ctx_ds, mean_threshold: float = 0.75, min_pages: int = 2):
    """Rules (rule_key → type): most subject entities of these listings have
    the type (A6, extract.py:79-147)."""
    return _mine(ctx_ds, 'ent_types', mean_threshold, min_pages)


def mine_relation_rules(ctx_ds, mean_threshold: float = 0.75, min_pages: int = 2):
    """Rules (rule_key → predicate): most subject entities relate to the
    page entity via the predicate (A7, extract.py:169-258)."""
    return _mine(ctx_ds, 'rels_to_page', mean_threshold, min_pages)


def apply_rules(ctx_ds, type_rules: pd.DataFrame, relation_rules: pd.DataFrame):
    """Assert missing targets on matching listings (anti-join vs existing
    facts is already encoded in ent_types/rels_to_page: only entities
    LACKING the target produce a new triple — extract.py:286-299)."""
    t_rules: Dict[tuple, List[str]] = defaultdict(list)
    for _, r in type_rules.iterrows():
        t_rules[(r['page_type'], r['topsection'], r['section'])].append(r['target'])
    r_rules: Dict[tuple, List[str]] = defaultdict(list)
    for _, r in relation_rules.iterrows():
        r_rules[(r['page_type'], r['topsection'], r['section'])].append(r['target'])
    rules_ref = ray.put((dict(t_rules), dict(r_rules)))

    def emit(batch: pd.DataFrame) -> pa.Table:
        from .triples import TRIPLES_SCHEMA
        tr, rr = ray.get(rules_ref)
        subj, pred, obj, lit = [], [], [], []
        for _, r in batch.iterrows():
            if not r['entity']:
                continue
            key = (r['page_type'], r['topsection'], r['section'])
            for t in tr.get(key, ()):  # new type if entity lacks it
                if t not in r['ent_types']:
                    subj.append(r['entity']); pred.append('rdf:type')
                    obj.append(t); lit.append(False)
            for p in rr.get(key, ()):  # new relation to the page entity
                if p not in r['rels_to_page']:
                    subj.append(r['entity']); pred.append(p)
                    obj.append(r['page_entity']); lit.append(False)
        return pa.Table.from_pydict({'subj': subj, 'pred': pred, 'obj': obj,
                                     'is_literal': lit}, schema=TRIPLES_SCHEMA)

    return ctx_ds.map_batches(emit, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
