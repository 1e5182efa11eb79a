"""Mention-detection data path: transformer chunking (M18, reference
…/mention_detection/data/chunking.py:91-179) + training-label heuristics
(M19, …/mention_detection/labels/heuristics.py:17-74) — the pure token math
and label rules a real MD transformer consumes, so dropping the model in is
a constructor swap on the ST3 actor stage.

Chunking semantics mirrored: every chunk =
  [page-title ⧺ CTX ⧺ topsection ⧺ CTX ⧺ section ⧺ CTX(-END)
   (⧺ header-cell ⧺ COL … for tables)] + up to MAX_ITEMS_PER_CHUNK items,
each item prefixed with its depth/row special token and truncated to
MAX_TOKENS_PER_ITEM; a chunk closes when it would exceed
MAX_TOKENS_PER_CHUNK or MAX_ITEMS_PER_CHUNK; chunks with fewer than
MIN_ITEMS_PER_CHUNK real items are dropped. Label channel: context tokens
IGNORE (-100), item tokens NO_ENTITY (-2) unless a labels dict marks them.
Deviation: our table rows are flattened token lists (the parser does not
keep per-cell nesting), so rows get the TABLE_ROW prefix only.

Execution: one ``grouped_map`` keyed (page_id, listing_idx) — a listing's
items must meet in one task; everything else is per-listing token math.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pandas as pd

from ..config import NEW_ENTITY, NO_ENTITY
from ..functions.strings import tokenize

MAX_TOKENS_PER_CHUNK = 300
MIN_ITEMS_PER_CHUNK = 3
MAX_ITEMS_PER_CHUNK = 16
MAX_TOKENS_PER_ITEM = 30
IGNORE = -100

CTX_SEP = '[CTX]'
CTX_END = '[CTXE]'
TABLE_COL = '[COL]'
TABLE_ROW = '[ROW]'


def entry_token_by_depth(depth: int) -> str:
    return f'[E{max(1, min(int(depth), 4))}]'


def listing_context_tokens(page_title: str, topsection: str, section: str,
                           ltype: str, header: List[str]) -> List[str]:
    """Context prefix of every chunk of a listing (chunking.py:123-142)."""
    toks: List[str] = []
    toks.extend(tokenize(page_title or '') + [CTX_SEP])
    toks.extend(tokenize(topsection or '') + [CTX_SEP])
    toks.extend(tokenize(section or '') + [CTX_SEP])
    if ltype == 'table' and header:
        for cell in header:
            toks.extend([cell, TABLE_COL])
    # reference parity (chunking.py:140): CONTEXT_END REPLACES the final
    # token — for a table that is the last header cell's [COL] marker
    toks[-1] = CTX_END
    return toks


def chunk_listing_items(context: List[str], items: List[dict],
                        labels: Optional[Dict[int, List[int]]] = None
                        ) -> List[dict]:
    """One listing's item rows → chunk dicts (tokens, labels, item_idxs)."""
    # a pathological context (e.g. a 100-column table header) would leave
    # max_chunk below every item's length — each item then opens its own
    # sub-minimum chunk and the listing silently vanishes, or the chunks
    # kept would overflow the transformer budget the constant enforces;
    # truncate the context so one max-length item always fits
    max_ctx = MAX_TOKENS_PER_CHUNK - MAX_TOKENS_PER_ITEM
    if len(context) > max_ctx:
        context = context[:max_ctx - 1] + [CTX_END]
    max_chunk = MAX_TOKENS_PER_CHUNK - len(context)
    ctx_labels = [IGNORE] * len(context)
    packed: List[List[Tuple[int, List[str], List[int]]]] = []
    size = 0
    for it in items:
        raw = it['tokens']
        toks = list(raw) if raw is not None else []   # ndarray-safe
        if not toks:
            continue
        if labels is not None and it['item_idx'] not in labels:
            continue
        item_labels = (labels[it['item_idx']] if labels is not None
                       else [NO_ENTITY] * len(toks))
        prefix = TABLE_ROW if it.get('ltype') == 'table' \
            else entry_token_by_depth(it.get('depth', 1))
        toks = ([prefix] + toks)[:MAX_TOKENS_PER_ITEM]
        item_labels = ([NO_ENTITY] + list(item_labels))[:MAX_TOKENS_PER_ITEM]
        new_size = size + len(toks)
        if not packed or new_size > max_chunk or len(packed[-1]) >= MAX_ITEMS_PER_CHUNK:
            packed.append([(it['item_idx'], toks, item_labels)])
            size = len(toks)
        else:
            packed[-1].append((it['item_idx'], toks, item_labels))
            size = new_size
    out = []
    for chunk_idx, chunk in enumerate(packed):
        if len(chunk) < MIN_ITEMS_PER_CHUNK:
            continue
        out.append({
            'chunk_idx': chunk_idx,
            'tokens': context + [t for _, toks, _ in chunk for t in toks],
            'labels': ctx_labels + [l for _, _, lbls in chunk for l in lbls],
            'item_idxs': [idx for idx, _, _ in chunk],
        })
    return out


def chunk_listings(items_ds, labels_ref=None, carry_cols: tuple = ()):
    """items Dataset → chunk rows (page_id, listing_idx, chunk_idx, tokens,
    labels, item_idxs). ``labels_ref``: optional ray.put'd
    {(page_id, listing_idx): {item_idx: [token labels]}} from M19.
    ``carry_cols``: listing-constant columns to carry through (e.g. a
    SQL-derivable doc id for the oracle gate)."""
    import ray
    from .relational import bucketed_map

    cols = ['page_id', 'listing_idx', 'item_idx', 'page_title', 'topsection',
            'section', 'ltype', 'header', 'depth', 'tokens'] + list(carry_cols)
    have = [c for c in cols if c in items_ds.schema().names]
    out_cols = ['page_id', 'listing_idx', 'chunk_idx', 'tokens', 'labels',
                'item_idxs'] + list(carry_cols)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """All listings of a bucket in one pass: numpy boundary slicing over
        a (page_id, listing_idx, item_idx)-sorted frame — no per-listing
        DataFrame/groupby objects (they dominated wall-time at ~0.3 ms per
        listing across tens of thousands of listings)."""
        from ..state.broadcast import get_broadcast
        all_labels = get_broadcast(labels_ref) if labels_ref is not None else None
        g = g.sort_values(['page_id', 'listing_idx', 'item_idx'],
                          kind='mergesort')
        pid = g['page_id'].to_numpy()
        lid = g['listing_idx'].to_numpy()
        change = np.flatnonzero((pid[1:] != pid[:-1]) | (lid[1:] != lid[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(g)]))
        col = {c: g[c].to_numpy() for c in g.columns}
        has_depth = 'depth' in col
        out: Dict[str, list] = {c: [] for c in out_cols}
        for s, e in zip(starts, ends):
            labels = None
            if all_labels is not None:
                labels = all_labels.get((int(pid[s]), int(lid[s])))
                if labels is None:
                    continue
            hdr = col['header'][s] if 'header' in col else None
            if hdr is None or (np.isscalar(hdr) and pd.isna(hdr)):
                hdr = []   # Arrow list columns arrive as ndarray: `or []`
            ltype = col['ltype'][s] if 'ltype' in col else ''
            context = listing_context_tokens(
                col['page_title'][s] if 'page_title' in col else '',
                col['topsection'][s] if 'topsection' in col else '',
                col['section'][s] if 'section' in col else '',
                ltype, list(hdr))
            items = [{'item_idx': col['item_idx'][i],
                      'tokens': col['tokens'][i], 'ltype': ltype,
                      'depth': col['depth'][i] if has_depth else 1}
                     for i in range(s, e)]
            chunks = chunk_listing_items(context, items, labels)
            for ch in chunks:
                out['page_id'].append(pid[s])
                out['listing_idx'].append(lid[s])
                out['chunk_idx'].append(ch['chunk_idx'])
                out['tokens'].append(ch['tokens'])
                out['labels'].append(ch['labels'])
                out['item_idxs'].append(ch['item_idxs'])
                for c in carry_cols:
                    out[c].append(col[c][s])
        return pd.DataFrame(out)

    return bucketed_map(items_ds.select_columns(have),
                        ['page_id', 'listing_idx'], per_bucket)


# --- M19: training-label heuristics -----------------------------------------

def find_listing_training_labels(mentions_ds, min_entities: int = 5):
    """Page-path label heuristic (labels/heuristics.py:24-32): a listing's
    subject entities are consistent training positives iff the listing has
    ≥ min_entities distinct subject entities and exactly ONE distinct NER
    tag among them. Mentions may carry a 'tag' column (defaults to one
    pseudo-tag when absent — tags arrive with a real MD model).
    Returns (page_id, listing_idx, positives: list[str])."""
    from .relational import grouped_map

    def per_listing(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        mask = g['entity'].notna()
        if 'is_subject' in g.columns:   # optional, like 'tag' below — the
            mask &= g['is_subject']     # projection already treats it so
        subj = g[mask]
        if subj.empty:
            return None
        positives = sorted(subj['entity'].unique())
        tags = set(subj['tag'].unique()) if 'tag' in subj.columns else {'ENT'}
        if len(positives) < min_entities or len(tags) != 1:
            return None
        return pd.DataFrame({'page_id': [g.iloc[0]['page_id']],
                             'listing_idx': [g.iloc[0]['listing_idx']],
                             'positives': [positives]})

    cols = [c for c in ['page_id', 'listing_idx', 'entity', 'is_subject', 'tag']
            if c in mentions_ds.schema().names]
    return grouped_map(mentions_ds.select_columns(cols),
                       ['page_id', 'listing_idx'], per_listing)


def find_listpage_training_labels(mentions_ds, candidates_by_page: Dict[int, Set[str]],
                                  disjoint_ents_by_page: Dict[int, Set[str]]):
    """Listpage-path label heuristic (labels/heuristics.py:36-60): per
    listing, positives = mentioned entities in the page's candidate set
    (category descendants), negatives = entities carrying a type disjoint
    with the page's types; listings whose positive count is 1 or 2 are
    dropped (a single entity repeating). Candidate/disjoint dims broadcast.
    Returns (page_id, listing_idx, positives, negatives)."""
    import ray
    from .relational import grouped_map
    ref = ray.put((candidates_by_page, disjoint_ents_by_page))

    def per_listing(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        from ..state.broadcast import get_broadcast
        cands, disj = get_broadcast(ref)
        pid = int(g.iloc[0]['page_id'])
        page_cands = cands.get(pid, set())
        page_disj = disj.get(pid, set())
        ents = {e for e in g['entity'] if e}
        positives = sorted(ents & page_cands)
        negatives = sorted(ents & page_disj - set(positives))
        if not positives and not negatives:
            return None
        if 0 < len(positives) <= 2:
            return None
        return pd.DataFrame({'page_id': [g.iloc[0]['page_id']],
                             'listing_idx': [g.iloc[0]['listing_idx']],
                             'positives': [positives],
                             'negatives': [negatives]})

    cols = [c for c in ['page_id', 'listing_idx', 'entity']
            if c in mentions_ds.schema().names]
    return grouped_map(mentions_ds.select_columns(cols),
                       ['page_id', 'listing_idx'], per_listing)


def token_labels_for_item(tokens: List[str], mentions: List[dict],
                          positives: Set[str]) -> List[int]:
    """Token labeling (labels/__init__.py:8-63): tokens inside a subject
    mention span of a positive entity get NEW_ENTITY, all other tokens
    NO_ENTITY — the target sequence for MD fine-tuning."""
    out = [NO_ENTITY] * len(tokens)
    for m in mentions:
        name = m.get('name') or m.get('entity')
        if name in positives:
            for i in range(m['start'], min(m['end'], len(tokens))):
                out[i] = NEW_ENTITY
    return out
