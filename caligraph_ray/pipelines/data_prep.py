"""Composite training-data preparation pipeline — the LLM-data-side
flagship, chaining the individually-gated hygiene operators into the
end-to-end shape a 100 TB pretraining run needs:

    raw docs
      → language gate        (stopword-ratio heuristic, integer
                              cross-multiplied — stages/textstats.lang_id
                              rule at per-mille precision)
      → length gate          (n_tokens ≥ min_tokens)
      → split gate           (held-out md5 split removed from training —
                              hash_split semantics, pure function of id)
      → host-quality gate    (drop whole low-diversity hosts; recomputed
                              over the surviving docs — document order
                              matters and is part of the contract)
      → exact dedup          (min-doc_id representative per identical text)
      → decontamination      (drop survivors sharing any 5-gram shingle
                              with a held-out-split document of the RAW
                              corpus — eval sets are fixed upstream)
      → sequence packing     (concat-and-split doc → training-sequence
                              index via the distributed prefix sum)

Every stage keeps its scale shape (two-phase aggregates, volume-gated
broadcasts, one keyed exchange each); every rule is integer-exact, so the
whole chain replays in SQL as one CTE stack (pipelines/queries
SQL_TRAINING_PREP) — the composite is hash-gated end to end, not just its
pieces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import AGG_BATCH_SIZE
from ..stages.textstats import EN_STOPWORDS, _split_tokens


def training_data_prep(docs_ds, capacity: int = 512, min_tokens: int = 10,
                       stop_permille: int = 50, host_permille: int = 430,
                       test_split: int = 0, n_splits: int = 10,
                       host_broadcast_limit: int | None = None,
                       stage_hook=None):
    """docs (doc_id, text, source) → packed-sequence index of the cleaned
    training set: (doc_id, n_tokens, tok_offset, first_seq, last_seq).
    ``stage_hook(name, build) -> Dataset`` intercepts the three stage
    boundaries (01_gated / 02_clean / 03_packed) — the checkpointed
    variant plugs ``state.checkpoint.run_stage`` in here."""
    run = stage_hook or (lambda name, build: build())
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import MinHasher, md5_hash64
    from ..stages.dedup import exact_dedup
    from ..stages.relational import (bucketed_map, collect_pandas,
                                    semi_anti_join, shuffle_join)
    from ..stages.textstats import HOST_BROADCAST_LIMIT, packed_sequences

    limit = (HOST_BROADCAST_LIMIT if host_broadcast_limit is None
             else host_broadcast_limit)

    # --- gates 1-3 in ONE pass: lang ratio, length, training split -------
    def gate(batch: pa.Table) -> pa.Table:
        ids, texts, srcs, uniqs, toks_n = [], [], [], [], []
        for i, text, src in zip(batch.column('doc_id').to_pylist(),
                                batch.column('text').to_pylist(),
                                batch.column('source').to_pylist()):
            if md5_hash64(str(int(i))) % n_splits == test_split:
                continue                       # held-out split never trains
            toks = _split_tokens(text or '')
            n = len(toks)
            if n < min_tokens:
                continue
            stop = sum(t in EN_STOPWORDS for t in toks)
            if stop * 1000 < stop_permille * n:
                continue                       # language gate (integer)
            ids.append(i)
            texts.append(text)
            srcs.append(src)
            uniqs.append(len(set(toks)))
            toks_n.append(n)
        return pa.Table.from_pydict({
            'doc_id': pa.array(ids, pa.int64()),
            'text': pa.array(texts, pa.string()),
            'source': pa.array(srcs, pa.string()),
            'n_uniq': pa.array(uniqs, pa.int64()),
            'n_toks': pa.array(toks_n, pa.int64())})

    survivors = run('01_gated',
                    lambda: docs_ds.map_batches(
                        gate, batch_format='pyarrow',
                        batch_size=AGG_BATCH_SIZE)).materialize()

    def build_clean():
        s = survivors
        # --- host gate over survivors (two-phase; broadcast under gate) --
        host_stats = (s.select_columns(['source', 'n_uniq', 'n_toks'])
                      .groupby('source')
                      .aggregate(Sum('n_uniq', alias_name='su'),
                                 Sum('n_toks', alias_name='sn'))).materialize()
        import pyarrow.compute as pc

        def keep_mask(t: pa.Table) -> pa.Table:
            ok = pc.greater_equal(pc.multiply(t.column('su'), 1000),
                                  pc.multiply(t.column('sn'), host_permille))
            return t.filter(ok).select(['source'])

        kept_hosts = host_stats.map_batches(keep_mask, batch_format='pyarrow'
                                            ).materialize()
        if kept_hosts.count() <= max(limit, 0):
            s = semi_anti_join(
                s, collect_pandas(kept_hosts)['source']
                if kept_hosts.count() else [], 'source')
        else:                                 # web-scale host cardinality
            s = shuffle_join(s, kept_hosts,
                             left_on='source', right_on='source',
                             how='inner')
        s = s.materialize()

        # --- exact dedup: keep the min-doc_id representative per text ----
        reps = exact_dedup(s, id_col='doc_id', text_col='text')
        rep_ids = set(collect_pandas(reps)['rep_id'].astype('int64')) \
            if reps.count() else set()
        # rep dim is one row per DISTINCT text — alias-index budget class;
        # at 10^12 docs route through a text_hash shuffle_join instead (the
        # dim and the docs co-partition on the hash — same regime switch as
        # the host gate above)
        s = semi_anti_join(s, rep_ids, 'doc_id')

        # --- decontamination: drop survivors sharing a shingle with the
        # RAW corpus held-out split (ONE shingle-keyed exchange) ----------
        mh = MinHasher(shingle_size=5, shingle_hash=md5_hash64)

        def shingle_rows(side: str, only_split):
            def fn(batch: pa.Table) -> pa.Table:
                ids, hs = [], []
                for i, text in zip(batch.column('doc_id').to_pylist(),
                                   batch.column('text').to_pylist()):
                    if only_split is not None and \
                            md5_hash64(str(int(i))) % n_splits != only_split:
                        continue
                    for h in mh.shingles(_split_tokens(text or '')):
                        ids.append(i)
                        hs.append(np.int64(np.uint64(h) - (1 << 63)))
                return pa.Table.from_pydict({
                    'doc_id': pa.array(ids, pa.int64()),
                    'h': pa.array(hs, pa.int64()),
                    '_side': pa.array([side] * len(ids), pa.string())})
            return fn

        train_sh = s.select_columns(['doc_id', 'text']).map_batches(
            shingle_rows('t', None), batch_format='pyarrow',
            batch_size=AGG_BATCH_SIZE)
        test_sh = docs_ds.select_columns(['doc_id', 'text']).map_batches(
            shingle_rows('e', test_split), batch_format='pyarrow',
            batch_size=AGG_BATCH_SIZE)

        def hits(bucket: pd.DataFrame) -> pd.DataFrame:
            eval_hs = set(bucket.loc[bucket['_side'] == 'e', 'h'])
            if not eval_hs:
                return pd.DataFrame()
            hit = bucket[(bucket['_side'] == 't') & bucket['h'].isin(eval_hs)]
            return hit[['doc_id']].drop_duplicates()

        contaminated = bucketed_map(train_sh.union(test_sh), ['h'], hits)
        bad_ids = set(collect_pandas(contaminated)['doc_id'].astype('int64')) \
            if contaminated.count() else set()
        return semi_anti_join(s, bad_ids, 'doc_id', anti=True)

    clean = run('02_clean', build_clean)

    # --- pack the cleaned set into training sequences --------------------
    return run('03_packed',
               lambda: packed_sequences(
                   clean.select_columns(['doc_id', 'text']),
                   capacity=capacity))


def training_data_prep_checkpointed(docs_ds, root: str, **params):
    """Checkpointed/resumable composite (the LLM-data counterpart of
    run_flagship_checkpointed): the gate pass, the cleaned survivor set
    and the packed index each land as Parquet + _LINEAGE.json + _SUCCESS
    under ``root``; a rerun (after a crash or partial run) skips completed
    stages, and a changed config or corpus invalidates stale checkpoints
    via the fingerprint."""
    from ..state.checkpoint import run_stage

    fp = {'n_docs': int(docs_ds.count()),
          **{k: v for k, v in sorted(params.items())}}

    def hook(name, build):
        return run_stage(root, name, build, fingerprint=fp)

    return training_data_prep(docs_ds, stage_hook=hook, **params)
