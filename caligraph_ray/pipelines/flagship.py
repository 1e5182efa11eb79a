"""Flagship KG-construction pipeline (SURVEY.md §7.2 end-to-end slice).

read pages → map_batches(parse: text + listings + mentions) → flat item rows
→ explode mentions → broadcast alias index (two-phase count + ray.put)
→ actor-pool link → salted-groupby + connected-component canonicalization
→ triple emission → dedup/sort → hash-partitioned Parquet.

Exercises every execution pattern of the north star: stateless Arrow
map_batches, broadcast small-side join, actor pool, salted shuffle, CC merge
and a sort-materialize sink.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import (MENTION_ENTITY_THRESHOLD, MENTION_MENTION_THRESHOLD,
                      MM_SCORE, PATH_THRESHOLD, TOKEN_BATCH_SIZE)
from ..stages.alias import (build_alias_index, build_alias_index_local,
                            entity_names_from_index, explode_mentions,
                            link_mentions)
from ..stages.canonicalize import canonicalize, entity_node_id
from ..stages.triples import TRIPLES_SCHEMA, materialize_triples


def _mentions_cats_batch(t: pa.Table) -> pa.Table:
    """PARSED batch → slim (mention ∪ category ∪ drop-marker) union batch.

    Fusing the projection into the parse consumption means the pipeline
    never materializes the full parsed union (item token lists dominate its
    bytes); only mention rows plus (url, page_id, cat_name) category rows
    are pinned for the later phases. Pages the parser dropped (kind='drop',
    e.g. over the 60 s row budget) pass through as slim url-only marker
    rows so per-partition drop accounting (north-rule lineage) survives the
    fusion — every downstream view filters on its own kind."""
    from ..stages.alias import MENTIONS_SCHEMA, _explode_mentions_batch
    items = t.filter(pc.equal(t.column('kind'), pa.scalar('item'))) \
             .drop_columns(['kind', 'cat_name'])
    m = _explode_mentions_batch(items)
    m = m.append_column('cat_name', pa.nulls(m.num_rows, pa.string()))
    m = m.append_column('kind', pa.array(['m'] * m.num_rows, pa.string()))
    parts = [m]
    for kind in ('cat', 'drop'):
        ct = t.filter(pc.equal(t.column('kind'), pa.scalar(kind)))
        cols = {}
        for f in MENTIONS_SCHEMA:
            if f.name in ('url', 'page_id'):
                cols[f.name] = ct.column(f.name).cast(f.type)
            else:
                cols[f.name] = pa.nulls(ct.num_rows, f.type)
        cols['cat_name'] = ct.column('cat_name') if kind == 'cat' \
            else pa.nulls(ct.num_rows, pa.string())
        cols['kind'] = pa.array([kind] * ct.num_rows, pa.string())
        parts.append(pa.Table.from_pydict(cols, schema=m.schema))
    return pa.concat_tables(parts)


def _mentions_of(t: pa.Table) -> pa.Table:
    """Mention-row view of the combined (mentions ∪ cats) union."""
    return t.filter(pc.equal(t.column('kind'), pa.scalar('m'))) \
            .drop_columns(['kind', 'cat_name'])


def _cats_of(t: pa.Table) -> pa.Table:
    """Category-row view of the combined (mentions ∪ cats) union."""
    t = t.filter(pc.equal(t.column('kind'), pa.scalar('cat')))
    return t.select(['url', 'page_id', 'cat_name'])


def _scored_linked(mentions, embedder_factory=None, reranker_factory=None):
    """Scored-ED linking with a MEASURED entity-name-dim budget: the
    distinct non-empty wikilink-target names are computed distributed
    (two-phase distinct — one partial-combine exchange); only when the
    measured cardinality fits config.SCORED_NAME_LIMIT is the dim collected
    and broadcast (the fast regime). Over budget, linking runs against the
    name shards in the object store (ed.link_mentions_scored_sharded) —
    nothing dim-sized ever touches the driver, and the emitted links are
    bit-identical across regimes (pinned by test_flagship's forced-low-gate
    comparison). Returns (linked_ds, ent_names_or_None)."""
    from .. import config
    from ..stages.ed import link_mentions_scored, link_mentions_scored_sharded
    from ..stages.relational import arrow_filter, collect_pandas, two_phase_count

    named = arrow_filter(
        mentions, lambda t: pc.and_(pc.is_valid(t['name']),
                                    pc.not_equal(t['name'], pa.scalar(''))))
    names_ds = two_phase_count(
        named.select_columns(['name']), ['name']).select_columns(['name']) \
        .materialize()
    if names_ds.count() <= config.SCORED_NAME_LIMIT:
        ent_names = sorted(collect_pandas(names_ds)['name'])
        return link_mentions_scored(
            mentions, ent_names, embedder_factory=embedder_factory,
            reranker_factory=reranker_factory), ent_names
    import logging
    logging.getLogger('caligraph_ray.flagship').warning(
        'scored-ED entity-name dim over budget (> %d); linking against '
        'object-store name shards', config.SCORED_NAME_LIMIT)
    return link_mentions_scored_sharded(
        mentions, names_ds, embedder_factory=embedder_factory,
        reranker_factory=reranker_factory), None


def run_flagship(pages_ds, out_dir: Optional[str] = None,
                 me_threshold: float = MENTION_ENTITY_THRESHOLD,
                 mm_threshold: float = MENTION_MENTION_THRESHOLD,
                 path_threshold: float = PATH_THRESHOLD,
                 concurrency: Optional[int] = None, linking: str = 'auto',
                 redirects_ds=None, canon: str = 'auto',
                 surface_budget: Optional[int] = None,
                 markup: str = 'html', embedder_factory=None,
                 reranker_factory=None, stage_hook=None):
    """pages Dataset (F1 schema) → deduped, sorted triples Dataset.

    ``linking``: 'broadcast' (index collected + ray.put once — fastest while
    the surface dim fits the object-store budget), 'join' (co-partitioned
    hash join, nothing driver-side — the 10^12-row path), 'scored' (the full
    ED stack: bi-encoder embed → candidate top-k → cross-encoder rerank,
    deterministic stand-ins behind the real actor interfaces — stages/ed.py),
    or 'auto' (pick broadcast/join by mention volume vs ALIAS_BROADCAST_LIMIT).

    ``stage_hook(name, build) -> Dataset`` intercepts every wide stage
    boundary (01_combined parse+slim-union, 02_categories, 03_mentions,
    04_linked, 05_triples) — the same seam as
    ``data_prep.training_data_prep``, so ``run_flagship_checkpointed`` is
    THIS code path with Parquet+lineage persistence, never a drifting
    re-implementation. Without a hook, only the stages the streaming plan
    genuinely needs pinned are materialized (mentions stays a lazy filter
    view; assembled triples stream into the sink)."""
    from ..config import ALIAS_BROADCAST_LIMIT
    from ..stages.alias import link_mentions_join
    from ..stages.html_extract import parse_pages
    # ONE parse per page, fused straight into the mention/category
    # projection: only the SLIM (mentions ∪ cats) union is materialized —
    # never the full parsed item rows with their token lists, whose
    # object-store footprint (and spill) was the non-scaling floor of the
    # end-to-end leg. ``markup``: 'html' (crawl analogue) or 'wikitext'
    # (XML-dump path via sources/xml_dump.dump_to_pages).
    if markup == 'wikitext':
        from ..stages.wikitext import parse_wikitext_pages as _parse
    else:
        _parse = parse_pages
    run = stage_hook or (lambda name, build: build().materialize())
    parsed = _parse(pages_ds, concurrency=concurrency)
    combined = run('01_combined',
                   lambda: parsed.map_batches(_mentions_cats_batch,
                                              batch_format='pyarrow'))
    cats = run('02_categories',
               lambda: combined.map_batches(_cats_of, batch_format='pyarrow'))
    mentions = combined.map_batches(_mentions_of, batch_format='pyarrow')

    if redirects_ds is not None:
        # D2: fold wikilink targets through the redirect map (levenshtein≤2
        # spelling guard) BEFORE alias grouping, so distinct surfaces that
        # redirect to one entity merge (reference resource.py:290-305)
        from ..stages.redirects import fold_redirects
        mentions = run('03_mentions',
                       lambda: fold_redirects(mentions, redirects_ds,
                                              col='name'))
        del combined
    elif stage_hook is not None:
        # resumability wants the exploded mentions durable; the extra write
        # is the checkpointing price and only paid when a hook is installed
        mentions = run('03_mentions', lambda: mentions)
    # else: mentions stays a LAZY filter over the pinned slim union — its
    # consumers (count, index scan, linking) fuse the cheap arrow mask into
    # their own scans. Re-materializing the filter was a full extra
    # write pass of ~95% of the union's rows (15 s at 2M pages / 16 CPUs)
    # that bought nothing: the union IS the pinned copy.
    n_mentions = mentions.count()
    use_join = linking == 'join' or (linking == 'auto'
                                     and n_mentions > ALIAS_BROADCAST_LIMIT)
    if linking == 'scored':
        # the constructor-swap seam reaches the full pipeline: pass
        # factories returning TRAINED models (functions/train_transformer)
        # and the whole KG build runs on learned weights. ent_names rides a
        # holder: on a hook-resumed run the build is skipped and ent_names
        # stays None — _assemble_triples then derives the dim from `linked`
        # itself, distributed.
        _ent_holder = {}

        def _build_scored():
            linked_, names_ = _scored_linked(
                mentions, embedder_factory=embedder_factory,
                reranker_factory=reranker_factory)
            _ent_holder['names'] = names_
            return linked_

        linked = run('04_linked', _build_scored)
        ent_names = _ent_holder.get('names')
    elif use_join:
        linked = run('04_linked', lambda: link_mentions_join(mentions))
        ent_names = None   # derived distributed inside _assemble_triples
    else:
        index = build_alias_index_local(mentions)
        index_ref = ray.put(index)
        linked = run('04_linked',
                     lambda: link_mentions(mentions, index_ref,
                                           concurrency=concurrency))
        ent_names = entity_names_from_index(index)

    all_triples = _assemble_triples(linked, cats, me_threshold, mm_threshold,
                                    path_threshold, ent_names=ent_names,
                                    total_rows=n_mentions, canon=canon,
                                    surface_budget=surface_budget)
    if stage_hook is not None:
        # default path streams the assembled triples straight into the
        # sink; under a hook they persist as their own resumable stage
        all_triples = run('05_triples', lambda: all_triples)
    return materialize_triples(all_triples, out_dir=out_dir)


def run_flagship_checkpointed(pages_ds, root: str,
                              me_threshold: float = MENTION_ENTITY_THRESHOLD,
                              mm_threshold: float = MENTION_MENTION_THRESHOLD,
                              path_threshold: float = PATH_THRESHOLD,
                              linking: str = 'broadcast',
                              redirects_ds=None, **kw):
    """Checkpointed flagship: ``run_flagship`` with a ``stage_hook`` that
    persists every wide stage as Parquet + _LINEAGE.json + _SUCCESS under
    ``root`` — the SAME code path as the direct run (the data_prep.py
    pattern), so the two can never drift. A rerun (after a crash or a
    partial run) skips completed stages (north-rule resumability); a
    changed corpus/config invalidates stale checkpoints via per-stage
    fingerprints. The final triples land hash-partitioned under
    ``root``/triples_out (idempotent sink: wipe-or-skip via _SUCCESS).
    Drop accounting (pages the parser rejected) rides the 01_combined
    stage as kind='drop' marker rows and is stamped into its lineage."""
    import json as _json
    import os

    from ..state.checkpoint import read_lineage, run_stage

    # fingerprint: input size + thresholds — a rerun of the same root with a
    # different corpus or config invalidates stale checkpoints instead of
    # silently reusing them
    n_pages = pages_ds.count()
    fp_in = {'n_pages': int(n_pages),
             'redirects': redirects_ds is not None}
    fp_link = fp_in | {'linking': linking}
    fp_cfg = fp_link | {'me': me_threshold, 'mm': mm_threshold,
                        'path': path_threshold}
    fps = {'01_combined': fp_in, '02_categories': fp_in,
           '03_mentions': fp_in, '04_linked': fp_link,
           '05_triples': fp_cfg}

    def hook(name, build):
        out = run_stage(root, name, build, fingerprint=fps[name])
        if name == '01_combined':
            lin = read_lineage(root, name)
            if lin is not None and 'parse_drops' not in lin:
                n_drops = out.map_batches(
                    lambda t: t.filter(pc.equal(t.column('kind'),
                                                pa.scalar('drop'))),
                    batch_format='pyarrow').count()
                lin['parse_drops'] = int(n_drops)
                with open(os.path.join(root, name, '_LINEAGE.json'),
                          'w') as f:
                    _json.dump(lin, f, indent=2)
        return out

    return run_flagship(pages_ds, out_dir=os.path.join(root, 'triples_out'),
                        me_threshold=me_threshold, mm_threshold=mm_threshold,
                        path_threshold=path_threshold, linking=linking,
                        redirects_ds=redirects_ds, stage_hook=hook, **kw)


def _emit_subject_pairs(canon: pd.Series, urls: pd.Series,
                        labels: pd.Series) -> pa.Table:
    """Shared triple emission for both canonicalization paths: per subject
    mention, (canon, mentionedIn, page) + (canon, label, surface-label)."""
    import numpy as np
    n = len(canon)
    page = urls.str.rsplit('/', n=1).str[-1].str.replace('_', ' ', regex=False)
    subj = np.repeat(canon.to_numpy(), 2)
    obj = np.empty(2 * n, dtype=object)
    obj[0::2] = page.to_numpy()
    obj[1::2] = labels.to_numpy()
    pred = np.empty(2 * n, dtype=object)
    pred[0::2] = 'mentionedIn'
    pred[1::2] = 'label'
    lit = np.zeros(2 * n, dtype=bool)
    lit[1::2] = True
    return pa.Table.from_pydict(
        {'subj': subj, 'pred': pred, 'obj': obj, 'is_literal': lit},
        schema=TRIPLES_SCHEMA)


def _ne_name(c) -> str:
    return f'NE_{int(c) & 0x7FFFFFFFFFFFFFFF:x}'


def _assemble_triples_join(linked, me_threshold, mm_threshold, path_threshold,
                           total_rows: Optional[int] = None):
    """The 10^12-row canonicalization tail: NOTHING dim-sized touches the
    driver. Mention-level ``canonicalize()`` produces a (node, cluster,
    entity|null) Dataset; cluster → canonical name resolves inside the
    Dataset (entity name, else NE_<cluster>); subject mentions get their
    canon via ONE hash shuffle-join on mention_uid. Mentions absent from the
    alignment graph (no qualifying link, unique surface) are singletons —
    the left join's null canon falls back to NE_<own uid>, exactly the
    surface path's ``rest`` branch. Label parity with the surface path is
    pinned by test_flagship's forced-path comparison."""
    from ..stages.canonicalize import canonicalize
    from ..stages.relational import shuffle_join

    cl = canonicalize(linked, me_threshold, mm_threshold,
                      path_threshold=path_threshold, total_rows=total_rows)

    def name_of(batch: pa.Table) -> pa.Table:
        ents = batch.column('entity').to_pylist()
        clus = batch.column('cluster').to_pylist()
        canon = [e if e is not None else _ne_name(c)
                 for e, c in zip(ents, clus)]
        return pa.Table.from_pydict({
            'node': batch.column('node').cast(pa.int64()),
            '_canon': pa.array(canon, pa.string())})

    cmap = cl.map_batches(name_of, batch_format='pyarrow')
    subs = linked.map_batches(
        lambda t: t.filter(pc.equal(t.column('is_subject'), pa.scalar(True))),
        batch_format='pyarrow').select_columns(['mention_uid', 'url', 'label'])
    # cmap is mention-scale (one row per alignment-graph node): declare it
    # fact-sized so the join streams it instead of materializing to measure
    joined = shuffle_join(subs, cmap, left_on='mention_uid', right_on='node',
                          how='left', right_hint='fact')

    def emit(batch: pd.DataFrame) -> pa.Table:
        if not len(batch):
            return pa.Table.from_pydict(
                {'subj': [], 'pred': [], 'obj': [], 'is_literal': []},
                schema=TRIPLES_SCHEMA)
        canon = batch['_canon'].astype(object)
        miss = canon.isna()
        if miss.any():
            canon = canon.mask(miss, batch['mention_uid'][miss].map(_ne_name))
        return _emit_subject_pairs(canon, batch['url'], batch['label'])

    return joined.map_batches(emit, batch_format='pandas',
                              batch_size=TOKEN_BATCH_SIZE)


def _assemble_triples(linked, cats, me_threshold, mm_threshold, path_threshold,
                      ent_names: Optional[list] = None,
                      total_rows: Optional[int] = None,
                      canon: str = 'auto',
                      surface_budget: Optional[int] = None):
    """Canonicalize + emit; returns raw (pre-dedup) triples Dataset.

    ``canon``: 'surface' (closed-form collapsed path; driver holds the
    surface dim — fastest while it fits), 'join' (fully distributed
    canonicalize() + hash join — the scale path), or 'auto': try the surface
    path under a MEASURED dim-cardinality budget and fall back to the join
    path when canonicalize_surface raises SurfaceDimOverBudget. Single-entity
    components resolve via a broadcast surface→label dict (zero shuffle);
    only ambiguous multi-entity components go through the mention-level
    split."""
    from ..stages.canonicalize import (SURFACE_DIM_BUDGET,
                                       SurfaceDimOverBudget,
                                       canonicalize_surface)
    if surface_budget is None:
        surface_budget = SURFACE_DIM_BUDGET

    def _with_cats(subj_triples):
        return subj_triples.union(_category_triples(cats))

    if canon == 'join':
        return _with_cats(_assemble_triples_join(
            linked, me_threshold, mm_threshold, path_threshold, total_rows))
    try:
        surf_label, multi_info = canonicalize_surface(
            linked, me_threshold, mm_threshold, path_threshold=path_threshold,
            total_rows=total_rows,
            surface_budget=None if canon == 'surface' else surface_budget)
    except SurfaceDimOverBudget as e:
        import logging
        logging.getLogger('caligraph_ray.flagship').warning(
            'surface dim over budget (%s); routing to the distributed '
            'canonicalize() + labels-join path', e)
        return _with_cats(_assemble_triples_join(
            linked, me_threshold, mm_threshold, path_threshold, total_rows))
    if ent_names is None:
        from ..stages.relational import arrow_filter
        ent_names = arrow_filter(
            linked, lambda t: pc.is_valid(t['entity'])).unique('entity')
    id_to_name = {entity_node_id(e): e for e in sorted(set(e for e in ent_names if e))}
    state_ref = ray.put((surf_label, multi_info, id_to_name, mm_threshold))

    linked_subjects = linked.map_batches(
        lambda t: t.filter(pc.equal(t.column('is_subject'), pa.scalar(True))),
        batch_format='pyarrow')

    mm_score = MM_SCORE  # star-edge weight (build_alignment_edges default)

    def subject_triples(batch: pa.Table) -> pa.Table:
        """Vectorized cluster resolution: the common branches (single-entity
        surface, direct link, singleton) run as pandas map/mask kernels;
        only the ambiguous multi-entity-surface rows (a small minority by
        construction) take the closed-form per-row split."""
        import numpy as np
        from ..state.broadcast import get_broadcast
        surf_label_, multi_info_, id_to_name_, _ = get_broadcast(state_ref)
        df = batch.select(['mention_uid', 'url', 'entity', 'link_score',
                           'label', 'norm_surface']).to_pandas()
        n = len(df)
        cluster = np.empty(n, dtype=object)

        # object-dtype lookups: pandas map/dict paths would upcast the
        # 63-bit cluster ids to float64 and corrupt them
        single = np.array([surf_label_.get(s) for s in df['norm_surface']],
                          dtype=object)
        in_single = np.array([v is not None for v in single], dtype=bool)
        in_multi = df['norm_surface'].isin(multi_info_).to_numpy() \
            if multi_info_ else np.zeros(n, dtype=bool)
        direct = ((~in_multi) & (~in_single) & df['entity'].notna().to_numpy()
                  & (df['link_score'] > me_threshold).to_numpy())
        rest = ~(in_multi | in_single | direct)

        cluster[in_single] = single[in_single]
        if direct.any():
            cluster[direct] = [entity_node_id(e) for e in df.loc[direct, 'entity']]
        cluster[rest] = [int(u) for u in df.loc[rest, 'mention_uid']]
        if in_multi.any():
            vals = []
            for uid, ent, score, surf in zip(
                    df.loc[in_multi, 'mention_uid'], df.loc[in_multi, 'entity'],
                    df.loc[in_multi, 'link_score'], df.loc[in_multi, 'norm_surface']):
                rep, s_rep, src, rep_assigned = multi_info_[surf]
                s_direct = score if (ent is not None and score > me_threshold) else 0.0
                s_via = s_rep * mm_score
                if uid == rep:
                    c = entity_node_id(src) if rep_assigned else rep
                elif max(s_direct, s_via) > path_threshold:
                    # ties favor the direct link (matches Dijkstra pop order)
                    c = entity_node_id(ent if s_direct >= s_via else src)
                else:
                    c = rep if not rep_assigned else uid
                vals.append(c)
            cluster[in_multi] = vals

        canon = pd.Series(cluster, dtype=object).map(
            lambda c: id_to_name_.get(c, _ne_name(c)))
        return _emit_subject_pairs(canon, df['url'], df['label'])

    # whole blocks: the kernel is vectorized masks + dict lookups with a
    # Python loop only over the minority multi-entity rows; an explicit
    # batch_size re-slices the materialized linked blocks for no benefit
    subj_triples = linked_subjects.map_batches(subject_triples, batch_format='pyarrow',
                                               batch_size=None)
    return _with_cats(subj_triples)


def _category_triples(cats):
    def category_triples(batch: pa.Table) -> pa.Table:
        urls = batch.column('url').to_pylist()
        cats_l = batch.column('cat_name').to_pylist()
        subj = [u.rsplit('/', 1)[-1].replace('_', ' ') for u in urls]
        return pa.Table.from_pydict({
            'subj': subj,
            'pred': ['subject'] * len(subj),
            'obj': ['Category:' + c for c in cats_l],
            'is_literal': [False] * len(subj),
        }, schema=TRIPLES_SCHEMA)

    return cats.map_batches(category_triples, batch_format='pyarrow')


# --- driver-testdata adapter ----------------------------------------------

# tokens treated as known entities when rendering documents as pages
LINKED_VOCAB = ('spark', 'customer', 'join', 'merge', 'window',
                'vector', 'stream', 'batch', 'hash', 'filter')
DOC_CHUNK = 6          # tokens per rendered enum item
MIN_DOC_TOKENS = 13    # ceil(n/6) >= 3 items → page passes usefulness filter


def render_document_page(doc_id: int, text: str, lang: str, source: str) -> dict:
    """Deterministically wrap one driver `documents` row into the F1 page
    shape so the flagship pipeline can consume the driver testdata: tokens
    are chunked into enum items; LINKED_VOCAB tokens become wiki links."""
    tokens = [t for t in text.split(' ') if t]
    title = f'Document {doc_id}'
    lis = []
    for i in range(0, len(tokens), DOC_CHUNK):
        chunk = tokens[i:i + DOC_CHUNK]
        parts = []
        for t in chunk:
            if t in LINKED_VOCAB:
                parts.append(f'<a href="/wiki/{t.capitalize()}">{t}</a>')
            else:
                parts.append(t)
        lis.append('<li>' + ' '.join(parts) + '</li>')
    html = (f'<html><head><title>{title}</title></head><body><h1>{title}</h1>'
            f'<h2>Content</h2><ul>{"".join(lis)}</ul>'
            f'<div id="catlinks">Categories: '
            f'<a href="/wiki/Category:Documents_from_{source}">Documents from {source}</a>'
            f'</div></body></html>')
    plain_lines = [title, title, 'Content']
    plain_lines += [' '.join(tokens[i:i + DOC_CHUNK]) for i in range(0, len(tokens), DOC_CHUNK)]
    plain_lines += [f'Categories: Documents from {source}']
    text_out = '\n'.join(plain_lines)
    return {
        'url': f'https://ex.org/wiki/Document_{doc_id}',
        'warc_ts': 1_700_000_000_000_000 + doc_id * 1_000_000,
        'html': html.encode('utf-8'),
        'text': text_out,
        'lang': lang,
    }


def documents_to_pages(docs_ds):
    """driver documents Dataset → F1 pages Dataset (stateless map_batches).

    The driver tables are single parquet files → ONE input block → one
    downstream parse task; split to ~512-row blocks first so the parse
    fans out (a real crawl has thousands of files and skips this)."""
    docs_ds = docs_ds.repartition(target_num_rows_per_block=512)

    def render(batch: pd.DataFrame) -> pa.Table:
        recs = [render_document_page(int(r.doc_id), r.text, r.lang, r.source)
                for r in batch.itertuples()]
        return pa.Table.from_pydict({
            'url': [r['url'] for r in recs],
            'warc_ts': pa.array([r['warc_ts'] for r in recs], pa.timestamp('us')),
            'html': pa.array([r['html'] for r in recs], pa.binary()),
            'text': [r['text'] for r in recs],
            'lang': [r['lang'] for r in recs],
        })
    return docs_ds.map_batches(render, batch_format='pandas', batch_size=1024)


def run_flagship_on_documents(sf_dir: str, out_dir: Optional[str] = None, **kw):
    from ..stages.relational import read_table
    docs = read_table(sf_dir, 'documents',
                      ['doc_id', 'text', 'lang', 'source'])
    return run_flagship(documents_to_pages(docs), out_dir=out_dir, **kw)
