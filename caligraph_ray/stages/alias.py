"""Surface-form alias index + broadcast entity linking (north-star ST9/J1/A2/D2).

Build side (A2, reference impl/dbpedia/resource.py:173-194): count
(norm_surface, entity) pairs over all wikilink mentions with a two-phase
aggregate — partial counts inside ``map_batches`` (one row per key per
batch, bounding shuffle volume by #batches × #distinct-keys-per-batch even
for head surfaces like 'United States') followed by a small
``groupby().sum()``. The finished index is a driver dict put in the object
store ONCE (``ray.put``) and read once per actor — never re-shipped per
batch.

Lookup side (J1, reference wikimarkup_parser.py:50-59): an actor-pool
``map_batches`` stage resolving unlinked mentions to their most-frequent
entity for the surface form.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import NEW_ENTITY, TOKEN_BATCH_SIZE
from ..functions.hashing import stable_hash64
from ..functions.strings import normalize_surface, is_valid_entity_label

MENTIONS_SCHEMA = pa.schema([
    ('mention_uid', pa.int64()),
    ('url', pa.string()),
    ('page_id', pa.int64()),
    ('listing_idx', pa.int32()),
    ('item_idx', pa.int32()),
    ('mention_idx', pa.int32()),
    ('topsection', pa.string()),    # listing context carried through (J2)
    ('section', pa.string()),
    ('name', pa.string()),          # linked target or null
    ('label', pa.string()),
    ('norm_surface', pa.string()),
    ('is_subject', pa.bool_()),     # deterministic subject-entity heuristic
])


def _explode_mentions_batch(batch: pa.Table) -> pa.Table:
    """Item rows → mention rows. The subject-entity heuristic (deterministic
    stand-in for the reference's transformer mention detector ST3,
    mention_detection/__init__.py): the first mention starting at token 0 of
    a depth-1 item with a valid label is the item's subject entity."""
    cols = {name: [] for name in MENTIONS_SCHEMA.names}
    urls = batch.column('url').to_pylist()
    page_ids = batch.column('page_id').to_pylist()
    listing_idxs = batch.column('listing_idx').to_pylist()
    item_idxs = batch.column('item_idx').to_pylist()
    tops = batch.column('topsection').to_pylist()
    secs = batch.column('section').to_pylist()
    depths = batch.column('depth').to_pylist()
    mentions_col = batch.column('mentions').to_pylist()
    for url, pid, li, ii, top, sec, depth, mentions in zip(
            urls, page_ids, listing_idxs, item_idxs, tops, secs, depths, mentions_col):
        subject_assigned = False
        for mi, m in enumerate(mentions):
            label = m['label']
            is_subj = (not subject_assigned and depth == 1 and m['start'] == 0
                       and is_valid_entity_label(label))
            subject_assigned = subject_assigned or is_subj
            cols['mention_uid'].append(stable_hash64(f'{url}#{li}#{ii}#{mi}'))
            cols['url'].append(url)
            cols['page_id'].append(pid)
            cols['listing_idx'].append(li)
            cols['item_idx'].append(ii)
            cols['mention_idx'].append(mi)
            cols['topsection'].append(top)
            cols['section'].append(sec)
            cols['name'].append(m['name'])
            cols['label'].append(label)
            cols['norm_surface'].append(normalize_surface(label))
            cols['is_subject'].append(is_subj)
    return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)


def explode_mentions(items_ds):
    """items Dataset → mention rows Dataset (stateless map_batches)."""
    return items_ds.map_batches(_explode_mentions_batch, batch_format='pyarrow',
                                batch_size=TOKEN_BATCH_SIZE)


def _partial_alias_counts(batch: pa.Table) -> pa.Table:
    """Phase-1 combiner: per-batch (norm_surface, name) counts."""
    t = batch.select(['norm_surface', 'name'])
    t = t.filter(pc.and_kleene(pc.is_valid(t.column('name')),
                               pc.not_equal(t.column('norm_surface'), pa.scalar(''))))
    if t.num_rows == 0:
        return pa.Table.from_pydict({'norm_surface': pa.array([], pa.string()),
                                     'name': pa.array([], pa.string()),
                                     'cnt': pa.array([], pa.int64())})
    grouped = t.group_by(['norm_surface', 'name']).aggregate([([], 'count_all')])
    return grouped.rename_columns(['norm_surface', 'name', 'cnt'])


def alias_counts(mentions_ds):
    """(norm_surface, name, freq) Dataset via two-phase aggregation
    (arrow partial combine per batch, coarse-bucket final merge)."""
    from .relational import two_phase_pandas_agg
    partial = mentions_ds.map_batches(_partial_alias_counts, batch_format='pyarrow',
                                      batch_size=TOKEN_BATCH_SIZE)
    return two_phase_pandas_agg(partial, ['norm_surface', 'name'],
                                {'freq': ('cnt', 'sum')})


AliasIndex = Dict[str, List[Tuple[str, int]]]


def build_alias_index(mentions_ds) -> Tuple["ray.ObjectRef", int]:
    """Collect the (small-dim) alias index to the driver and broadcast it.

    Per-surface entity lists are sorted by (freq desc, name asc) so the
    argmax is deterministic. At 10^12-page scale the index would be sharded
    by hash(norm_surface) into K object-store shards with each actor loading
    only its shard(s); the single-shard path is used below the object-store
    budget (SURVEY.md §4 spill row).
    """
    index = build_alias_index_local(mentions_ds)
    return ray.put(index), len(index)


def build_alias_index_local(mentions_ds) -> AliasIndex:
    """Driver-side alias index dict (also the source of the known-entity
    dimension: every linked target appears as some surface's candidate)."""
    rows = alias_counts(mentions_ds).take_all()
    index: AliasIndex = {}
    for r in rows:
        index.setdefault(r['norm_surface'], []).append((r['name'], int(r['freq'])))
    for k in index:
        index[k].sort(key=lambda x: (-x[1], x[0]))
    return index


def entity_names_from_index(index: AliasIndex) -> List[str]:
    return sorted({name for cands in index.values() for name, _ in cands})


LINKED_EXTRA_FIELDS = [('entity', pa.string()), ('link_score', pa.float64())]


class AliasLinker:
    """Resolve each mention to an entity + confidence (ST9/J1 lookup stage).

    Linked mentions keep their wikilink target (score 1.0). Unlinked mentions
    get the most frequent entity for their surface with score
    freq/total_freq; surfaces unknown to the index stay NIL (entity null) —
    downstream canonicalization assigns NEW_ENTITY cluster ids
    (reference page_parser.py:519-525 + resource.py:173-194 semantics).

    Usable as an actor class (index in __init__) or through the stateless
    ``link_mentions`` task path with the process-local broadcast cache.
    """

    def __init__(self, index_ref):
        self.index: AliasIndex = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return link_batch(batch, self.index)


def link_batch(batch: pa.Table, index: AliasIndex) -> pa.Table:
    names = batch.column('name').to_pylist()
    surfaces = batch.column('norm_surface').to_pylist()
    entities: List[Optional[str]] = []
    scores: List[float] = []
    for name, surf in zip(names, surfaces):
        if name is not None:
            entities.append(name)
            scores.append(1.0)
            continue
        cands = index.get(surf)
        if not cands:
            entities.append(None)
            scores.append(0.0)
            continue
        total = sum(f for _, f in cands)
        entities.append(cands[0][0])
        scores.append(cands[0][1] / total if total else 0.0)
    out = batch.append_column('entity', pa.array(entities, pa.string()))
    return out.append_column('link_score', pa.array(scores, pa.float64()))


def link_mentions(mentions_ds, index_ref, concurrency: Optional[int] = None):
    """mention rows → + (entity, link_score) via broadcast alias lookup.
    Stateless tasks + process-local broadcast cache (one deserialize per
    worker process, instant scale-out — see state/broadcast.py)."""
    from ..state.broadcast import get_broadcast

    def fn(batch: pa.Table) -> pa.Table:
        return link_batch(batch, get_broadcast(index_ref))

    return mentions_ds.map_batches(fn, batch_format='pyarrow',
                                   batch_size=TOKEN_BATCH_SIZE)


# --- scale path: the alias dim as a DATASET, linking as a hash join ---------

def alias_argmax(counts_ds):
    """(norm_surface, name, freq) Dataset → one row per surface:
    (norm_surface, top_entity, top_score) where top = (freq desc, name asc)
    argmax and top_score = top_freq / total_freq — exactly the fields
    ``link_batch`` reads from the broadcast index, as a Dataset that never
    touches the driver."""
    from .relational import bucketed_map

    def top(bucket):
        tot = bucket.groupby('norm_surface', sort=False)['freq'].sum().rename('_total')
        s = bucket.sort_values(['norm_surface', 'freq', 'name'],
                               ascending=[True, False, True], kind='mergesort')
        s = s.drop_duplicates('norm_surface', keep='first')
        s = s.merge(tot, left_on='norm_surface', right_index=True)
        s['top_score'] = s['freq'] / s['_total']
        return s[['norm_surface', 'name', 'top_score']] \
            .rename(columns={'name': 'top_entity'})

    return bucketed_map(counts_ds, ['norm_surface'], top)


def link_mentions_join(mentions_ds, argmax_ds=None):
    """Linking WITHOUT a driver-side index: mentions are hash-joined with
    the per-surface argmax Dataset on norm_surface (shuffle_join — both
    sides co-partitioned, nothing collected). Produces exactly the
    ``link_mentions`` output: wikilinked mentions keep their target (score
    1.0); others take the surface's most frequent entity with score
    freq/total; unknown surfaces stay NIL. This is the 10^12-row path the
    broadcast index cannot serve (reference resource.py:173-194 semantics,
    distributed)."""
    import numpy as np
    import pandas as pd
    from .relational import shuffle_join

    if argmax_ds is None:
        argmax_ds = alias_argmax(alias_counts(mentions_ds))
    joined = shuffle_join(mentions_ds, argmax_ds,
                          'norm_surface', 'norm_surface', how='left')

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        linked = batch['name'].notna()
        has_cand = batch['top_entity'].notna()
        batch['entity'] = np.where(linked, batch['name'],
                                   np.where(has_cand, batch['top_entity'], None))
        batch['link_score'] = np.where(
            linked, 1.0,
            np.where(has_cand, batch['top_score'].fillna(0.0).astype(float), 0.0))
        return batch.drop(columns=['top_entity', 'top_score'])

    return joined.map_batches(finish, batch_format='pandas',
                              batch_size=TOKEN_BATCH_SIZE)


def build_alias_index_sharded(mentions_ds, n_shards: int = 16) -> List["ray.ObjectRef"]:
    """The promised hash(norm_surface)-sharded broadcast index: K
    object-store shards, each holding only its surfaces. Built from the
    distributed alias_counts Dataset one shard at a time (the driver holds
    ONE shard's rows at once, never the whole dim); an actor/task resolving
    a pre-partitioned block reads only its shard. For un-partitioned inputs
    prefer ``link_mentions_join`` (no index object at all)."""
    counts = alias_counts(mentions_ds)

    def add_shard(batch: pa.Table) -> pa.Table:
        surfs = batch.column('norm_surface').to_pylist()
        shard = [stable_hash64(s) % n_shards for s in surfs]
        return batch.append_column('shard', pa.array(shard, pa.int32()))

    sharded = counts.map_batches(add_shard, batch_format='pyarrow').materialize()
    refs: List["ray.ObjectRef"] = []
    for i in range(n_shards):
        rows = sharded.filter(lambda r, i=i: r['shard'] == i).take_all()
        index: AliasIndex = {}
        for r in rows:
            index.setdefault(r['norm_surface'], []).append((r['name'], int(r['freq'])))
        for k in index:
            index[k].sort(key=lambda x: (-x[1], x[0]))
        refs.append(ray.put(index))
    return refs
