"""M18/M19 goldens: chunk packing, context tokens, training-label rules."""

import pandas as pd
import pytest

from caligraph_ray.config import NEW_ENTITY, NO_ENTITY
from caligraph_ray.stages.chunking import (CTX_END, CTX_SEP, IGNORE,
                                           MAX_ITEMS_PER_CHUNK, TABLE_COL,
                                           chunk_listing_items,
                                           listing_context_tokens,
                                           token_labels_for_item)


def test_context_tokens_enum_and_table():
    ctx = listing_context_tokens('List of rivers', 'Geography', 'Rivers',
                                 'enum', [])
    assert ctx[-1] == CTX_END and ctx.count(CTX_SEP) == 2
    assert ctx[:4] == ['List', 'of', 'rivers', CTX_SEP]
    tctx = listing_context_tokens('P', 'T', 'S', 'table', ['Name', 'Year'])
    # header cells each followed by COL; final separator replaced by CTX_END
    assert tctx[-2:] == ['Year', CTX_END] and TABLE_COL in tctx


def test_chunk_packing_limits():
    ctx = ['C', CTX_END]
    items = [{'item_idx': i, 'tokens': ['w'] * 10, 'depth': 1, 'ltype': 'enum'}
             for i in range(40)]
    chunks = chunk_listing_items(ctx, items)
    # each item contributes 11 tokens (prefix + 10); 300-2 budget → 27 items
    # max by tokens but MAX_ITEMS_PER_CHUNK=16 binds first
    assert all(len(c['item_idxs']) <= MAX_ITEMS_PER_CHUNK for c in chunks)
    assert sum(len(c['item_idxs']) for c in chunks) == 40
    # every chunk's token/label lengths line up; context labeled IGNORE
    for c in chunks:
        assert len(c['tokens']) == len(c['labels']) <= 300
        assert c['labels'][:2] == [IGNORE, IGNORE]
        assert set(c['labels'][2:]) == {NO_ENTITY}


def test_chunk_min_items_dropped():
    ctx = ['C', CTX_END]
    items = [{'item_idx': i, 'tokens': ['w'] * 149, 'depth': 1, 'ltype': 'enum'}
             for i in range(2)]
    # each item 30 tokens (truncated); both fit one chunk of 2 items < 3 → dropped
    assert chunk_listing_items(ctx, items) == []


def test_item_truncation_and_prefix():
    ctx = ['C', CTX_END]
    items = [{'item_idx': 0, 'tokens': ['t'] * 50, 'depth': 2, 'ltype': 'enum'},
             {'item_idx': 1, 'tokens': ['u'] * 3, 'depth': 1, 'ltype': 'table'},
             {'item_idx': 2, 'tokens': ['v'] * 3, 'depth': 1, 'ltype': 'enum'}]
    chunks = chunk_listing_items(ctx, items)
    assert len(chunks) == 1
    toks = chunks[0]['tokens'][2:]
    assert toks[0] == '[E2]' and len([t for t in toks if t == 't']) == 29  # 30 cap
    assert '[ROW]' in toks and '[E1]' in toks


def test_chunk_listings_stage(ray_session):
    import ray.data as rd
    items = pd.DataFrame({
        'page_id': [1] * 4, 'listing_idx': [0] * 4, 'item_idx': [0, 1, 2, 3],
        'page_title': ['List of rivers'] * 4, 'topsection': ['Geo'] * 4,
        'section': ['Rivers'] * 4, 'ltype': ['enum'] * 4,
        'header': [[]] * 4, 'depth': [1] * 4,
        'tokens': [['Rhine'], ['Danube'], ['Elbe'], ['Po']],
    })
    from caligraph_ray.stages.chunking import chunk_listings
    out = chunk_listings(rd.from_pandas(items)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert list(row['item_idxs']) == [0, 1, 2, 3]
    assert 'Rhine' in list(row['tokens']) and CTX_END in list(row['tokens'])


def test_training_label_heuristics(ray_session):
    import ray.data as rd
    from caligraph_ray.stages.chunking import (find_listing_training_labels,
                                               find_listpage_training_labels)
    rows = []
    for i in range(6):   # listing 0: 6 distinct subject entities → kept
        rows.append({'page_id': 1, 'listing_idx': 0, 'entity': f'E{i}',
                     'is_subject': True})
    for i in range(3):   # listing 1: only 3 → dropped
        rows.append({'page_id': 1, 'listing_idx': 1, 'entity': f'F{i}',
                     'is_subject': True})
    out = find_listing_training_labels(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    assert len(out) == 1 and out.iloc[0]['listing_idx'] == 0
    assert list(out.iloc[0]['positives']) == [f'E{i}' for i in range(6)]

    lp = find_listpage_training_labels(
        rd.from_pandas(pd.DataFrame(rows)),
        candidates_by_page={1: {'E0', 'E1', 'E2', 'E3'}},
        disjoint_ents_by_page={1: {'E5', 'F0'}}).to_pandas()
    got = {int(r['listing_idx']): (list(r['positives']), list(r['negatives']))
           for _, r in lp.iterrows()}
    assert got[0] == (['E0', 'E1', 'E2', 'E3'], ['E5'])
    # listing 1: 0 positives but 1 negative → kept (positives==0 rule)
    assert got[1] == ([], ['F0'])


def test_token_labels_for_item():
    tokens = ['John', 'Smith', 'born', 'in', 'Paris']
    mentions = [{'name': 'John Smith', 'start': 0, 'end': 2},
                {'name': 'Paris', 'start': 4, 'end': 5}]
    labels = token_labels_for_item(tokens, mentions, {'John Smith'})
    assert labels == [NEW_ENTITY, NEW_ENTITY, NO_ENTITY, NO_ENTITY, NO_ENTITY]


def test_chunk_listings_table_header_ndarray(ray_session):
    # Arrow list<string> header columns arrive in pandas batches as
    # ndarrays; a multi-cell header must not crash on truthiness and must
    # contribute cell+[COL] context
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from caligraph_ray.stages.chunking import TABLE_COL, chunk_listings
    items = pa.table({
        'page_id': pa.array([1] * 4, pa.int64()),
        'listing_idx': pa.array([0] * 4, pa.int64()),
        'item_idx': pa.array([0, 1, 2, 3], pa.int64()),
        'page_title': pa.array(['T'] * 4),
        'topsection': pa.array(['S'] * 4),
        'section': pa.array(['s'] * 4),
        'ltype': pa.array(['table'] * 4),
        'header': pa.array([['Name', 'Year']] * 4, pa.list_(pa.string())),
        'depth': pa.array([1] * 4, pa.int64()),
        'tokens': pa.array([['a', 'b']] * 4, pa.list_(pa.string())),
    })
    out = chunk_listings(rd.from_arrow(items)).take_all()
    assert len(out) == 1
    toks = list(out[0]['tokens'])
    assert 'Name' in toks and TABLE_COL in toks


def test_chunk_context_overflow_truncated():
    # a pathological 300-token context must not make every chunk overflow
    # or silently drop the listing
    from caligraph_ray.stages.chunking import (CTX_END, MAX_TOKENS_PER_CHUNK,
                                               chunk_listing_items)
    ctx = [f'c{i}' for i in range(400)] + [CTX_END]
    items = [{'item_idx': i, 'tokens': ['x', 'y'], 'depth': 1}
             for i in range(4)]
    chunks = chunk_listing_items(ctx, items)
    assert chunks, 'listing must not vanish under a huge context'
    for ch in chunks:
        assert len(ch['tokens']) <= MAX_TOKENS_PER_CHUNK
        assert CTX_END in ch['tokens']


def test_training_labels_without_is_subject_column(ray_session):
    # is_subject is optional like tag: absent column means every mention
    # counts, not a KeyError in every task
    import ray.data as rd
    from caligraph_ray.stages.chunking import find_listing_training_labels
    df = pd.DataFrame({
        'page_id': [1] * 6, 'listing_idx': [0] * 6,
        'entity': ['A', 'B', 'C', 'D', 'E', None]})
    out = find_listing_training_labels(rd.from_pandas(df),
                                       min_entities=5).take_all()
    assert len(out) == 1
    assert sorted(out[0]['positives']) == ['A', 'B', 'C', 'D', 'E']
