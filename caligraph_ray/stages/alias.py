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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import NEW_ENTITY, TOKEN_BATCH_SIZE
from ..functions.hashing import stable_hash64
from ..functions.strings import (is_valid_entity_label, normalize_surface,
                                 normalize_surface_array)

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
    """Item rows → mention rows, vectorized with Arrow list kernels
    (list_flatten + parent indices + take); only the uid hash runs per row
    (blake2b — the deterministic universal-key contract). The
    subject-entity heuristic (deterministic stand-in for the reference's
    transformer mention detector ST3, mention_detection/__init__.py): the
    first mention starting at token 0 of a depth-1 item with a valid label
    is the item's subject entity."""
    import pyarrow.compute as pc
    mcol = batch.column('mentions')
    if mcol.num_chunks != 1:
        mcol = mcol.combine_chunks()
    marr = mcol.chunk(0) if isinstance(mcol, pa.ChunkedArray) else mcol
    flat = pc.list_flatten(marr)
    parents = pc.list_parent_indices(marr).to_numpy(zero_copy_only=False)
    total = len(flat)
    if total == 0:
        return pa.Table.from_pydict({n: [] for n in MENTIONS_SCHEMA.names},
                                    schema=MENTIONS_SCHEMA)
    lengths = pc.list_value_length(marr).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64)).astype(np.int64)
    # mention index within its item: arange minus each segment's start
    starts_of_seg = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    mention_idx = np.arange(total, dtype=np.int64) - np.repeat(starts_of_seg, lengths)

    names = flat.field('name')
    labels = flat.field('label')
    m_start = flat.field('start').to_numpy(zero_copy_only=False)

    def take_col(col_name):
        c = batch.column(col_name)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        return c.take(pa.array(parents))

    urls = take_col('url')
    depth_taken = take_col('depth').to_numpy(zero_copy_only=False)

    # valid entity label, vectorized (len > 2, not purely numeric)
    valid = pc.and_(
        pc.greater(pc.utf8_length(labels), 3 - 1),
        pc.invert(pc.match_substring_regex(labels, r'^\d+([.,]\d+)*$'))
    ).to_numpy(zero_copy_only=False)
    valid = np.nan_to_num(valid.astype(np.float64)).astype(bool)
    candidate = valid & (m_start == 0) & (depth_taken == 1)

    # first candidate per item: min mention_idx among candidates per segment
    BIG = np.int64(1 << 62)
    cand_idx = np.where(candidate, mention_idx, BIG)
    nonempty = lengths > 0
    if nonempty.any():
        seg_min = np.minimum.reduceat(cand_idx, starts_of_seg[nonempty])
        min_per_parent = np.full(len(lengths), BIG)
        min_per_parent[nonempty] = seg_min
    else:
        min_per_parent = np.full(len(lengths), BIG)
    is_subject = candidate & (mention_idx == min_per_parent[parents])

    # per-row uid hash (deterministic key contract; cheap vs parse cost)
    url_list = urls.to_pylist()
    li_list = take_col('listing_idx').to_pylist()
    ii_list = take_col('item_idx').to_pylist()
    uids = np.fromiter(
        (stable_hash64(f'{u}#{li}#{ii}#{mi}')
         for u, li, ii, mi in zip(url_list, li_list, ii_list, mention_idx)),
        dtype=np.int64, count=total)

    return pa.Table.from_pydict({
        'mention_uid': pa.array(uids, pa.int64()),
        'url': urls,
        'page_id': take_col('page_id'),
        'listing_idx': take_col('listing_idx'),
        'item_idx': take_col('item_idx'),
        'mention_idx': pa.array(mention_idx, pa.int32()),
        'topsection': take_col('topsection'),
        'section': take_col('section'),
        'name': names,
        'label': labels,
        'norm_surface': normalize_surface_array(labels),
        'is_subject': pa.array(is_subject),
    }, schema=MENTIONS_SCHEMA)


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
    # batch_size=None: whole blocks, zero-copy from plasma — an explicit
    # batch_size re-slices materialized blocks, which costs ~25% of this
    # scan at 2M pages for a kernel whose output is tiny either way
    partial = mentions_ds.map_batches(_partial_alias_counts, batch_format='pyarrow',
                                      batch_size=None)
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
    dimension: every linked target appears as some surface's candidate).

    Vectorized build: ONE global mergesort on (surface, freq desc, name)
    replaces the per-key sorts, and numpy boundary slicing replaces the
    per-row setdefault/append — the dict construction was a 13 s serial
    driver stall at 2M pages (fixed cost on every leg of the scaling
    ratio) and is ~6× cheaper this way."""
    import numpy as np

    from .relational import collect_pandas
    df = collect_pandas(alias_counts(mentions_ds))
    if df.empty:
        return {}
    df = df.sort_values(['norm_surface', 'freq', 'name'],
                        ascending=[True, False, True], kind='mergesort')
    surfaces = df['norm_surface'].to_numpy()
    names = df['name'].to_numpy()
    freqs = df['freq'].to_numpy().astype('int64')
    starts = np.flatnonzero(np.r_[True, surfaces[1:] != surfaces[:-1]])
    ends = np.r_[starts[1:], len(surfaces)]
    index: AliasIndex = {}
    for s, e in zip(starts.tolist(), ends.tolist()):
        index[surfaces[s]] = list(zip(names[s:e].tolist(),
                                      freqs[s:e].tolist()))
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


def _resolve_surface(index: AliasIndex, surf: str):
    cands = index.get(surf)
    if not cands:
        return (None, 0.0)
    total = sum(f for _, f in cands)
    return (cands[0][0], cands[0][1] / total if total else 0.0)


def link_batch(batch: pa.Table, index: AliasIndex) -> pa.Table:
    """Vectorized: wikilinked rows keep their target (score 1) via masks;
    unlinked rows resolve via ONE lookup per DISTINCT surface in the batch
    (surfaces repeat heavily), then a vectorized map."""
    import pyarrow.compute as pc
    names = batch.column('name')
    linked = pc.is_valid(names).to_numpy(zero_copy_only=False)
    surfaces = batch.column('norm_surface').to_pylist()
    n = batch.num_rows
    entities = np.array(names.to_pylist(), dtype=object)
    scores = np.where(linked, 1.0, 0.0)
    null_idx = np.where(~linked)[0]
    if len(null_idx):
        uniq = {}
        for i in null_idx:
            s = surfaces[i]
            if s not in uniq:
                uniq[s] = _resolve_surface(index, s)
        ents = np.array([uniq[surfaces[i]][0] for i in null_idx], dtype=object)
        scs = np.array([uniq[surfaces[i]][1] for i in null_idx])
        entities[null_idx] = ents
        scores[null_idx] = scs
    out = batch.append_column('entity', pa.array(entities, pa.string()))
    return out.append_column('link_score', pa.array(scores, pa.float64()))


def link_mentions(mentions_ds, index_ref, concurrency: Optional[int] = None):
    """mention rows → + (entity, link_score) via broadcast alias lookup.
    Stateless tasks + process-local broadcast cache (one deserialize per
    worker process, instant scale-out — see state/broadcast.py)."""
    from ..state.broadcast import get_broadcast

    def fn(batch: pa.Table) -> pa.Table:
        return link_batch(batch, get_broadcast(index_ref))

    # whole blocks: one distinct-surface lookup table per BLOCK instead of
    # per 4096-row slice (fewer repeated lookups, no block re-slicing)
    return mentions_ds.map_batches(fn, batch_format='pyarrow',
                                   batch_size=None)


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
    # materialize BEFORE the emptiness probe: schema() on a lazy Dataset
    # executes it, and the join below would then re-execute the whole
    # argmax pipeline a second time (the probe must not double the work —
    # the argmax dim is surface-sized, safe to pin)
    argmax_ds = argmax_ds.materialize()
    if argmax_ds.schema() is None:
        # zero wikilinked mentions anywhere → empty, schema-less argmax
        # (engine-wide empty contract); every mention is its own evidence:
        # keep wikilink targets at score 1.0, everything else stays NIL
        def nil(batch: pd.DataFrame) -> pd.DataFrame:
            linked = batch['name'].notna()
            batch['entity'] = np.where(linked, batch['name'], None)
            batch['link_score'] = np.where(linked, 1.0, 0.0)
            return batch
        return mentions_ds.map_batches(nil, batch_format='pandas',
                                       batch_size=TOKEN_BATCH_SIZE)
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
    block_refs = [b for bundle in sharded.iter_internal_ref_bundles()
                  for b in bundle.block_refs]

    # each shard's dict is assembled INSIDE a Ray task from zero-copy arrow
    # block reads and returned (task returns live in the object store, so
    # the returned ref IS the broadcast shard): the driver never holds a
    # single row, and the n_shards scans run in parallel on workers instead
    # of as n_shards serial driver-side collect passes
    @ray.remote
    def build_shard(i: int, *blocks) -> AliasIndex:
        index: AliasIndex = {}
        for b in blocks:
            if not isinstance(b, pa.Table) or b.num_rows == 0:
                continue
            t = b.filter(pc.equal(b.column('shard'), i))
            for surf, name, freq in zip(t.column('norm_surface').to_pylist(),
                                        t.column('name').to_pylist(),
                                        t.column('freq').to_pylist()):
                index.setdefault(surf, []).append((name, int(freq)))
        for k in index:
            index[k].sort(key=lambda x: (-x[1], x[0]))
        return index

    return [build_shard.remote(i, *block_refs) for i in range(n_shards)]
