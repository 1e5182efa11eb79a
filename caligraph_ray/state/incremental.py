"""Incremental state maintenance — the daily-append ingest pattern of a
100 TB corpus: a running aggregate lives as partitioned Parquet under a
state root, and each NEW input partition is processed exactly once (a
manifest of processed partition ids makes re-submission a no-op), merging
its delta into the state with one small exchange instead of recomputing
the history. Generation directories + a LATEST pointer written last give
crash-atomic updates (a reader never sees a half-written state; a crashed
update leaves LATEST on the previous generation and the partition
unprocessed — re-running completes it).

The shipped instance maintains corpus token counts (the vocabulary dim
every LM/TF-IDF/BPE stage consumes); the pattern — delta aggregate ∪
previous state → two-phase combine → next generation — is the same for
any distributive aggregate.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import pandas as pd


def _atomic_write(path: str, data: str):
    """Temp file + os.replace: a crash mid-write can never leave a
    truncated MANIFEST.json/LATEST (in-place truncation would — readers
    would then see corrupt JSON or a dangling generation pointer)."""
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _latest(root: str) -> Optional[str]:
    p = os.path.join(root, 'LATEST')
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return os.path.join(root, f.read().strip())


def processed_partitions(root: str) -> List[str]:
    p = os.path.join(root, 'MANIFEST.json')
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)['partitions']


def token_count_state(root: str):
    """Current (token, freq) state as a Dataset (empty if none yet)."""
    import pyarrow as pa
    import ray.data as rd
    cur = _latest(root)
    if cur is None:
        return rd.from_arrow(pa.Table.from_pydict(
            {'token': pa.array([], pa.string()),
             'freq': pa.array([], pa.int64())}))
    return rd.read_parquet(cur)


def update_token_counts(root: str, partition_id: str, docs_ds,
                        text_col: str = 'text') -> dict:
    """Merge one input partition's token counts into the running state.

    Exactly-once per ``partition_id``: a re-submitted partition returns
    without touching the state. The merge cost is O(delta + vocab), never
    O(history): the new partition aggregates two-phase, unions with the
    previous state Dataset, and one token-keyed combine writes the next
    generation; LATEST + MANIFEST flip only after the Parquet is durable.
    """
    from ray.data.aggregate import Sum

    from ..stages.textstats import token_counts

    os.makedirs(root, exist_ok=True)
    done = processed_partitions(root)
    if partition_id in done:
        return {'partition': partition_id, 'skipped': True,
                'generation': os.path.basename(_latest(root) or '')}

    delta = token_counts(docs_ds, text_col=text_col)
    merged = token_count_state(root).union(delta) \
        .groupby('token').aggregate(Sum('freq', alias_name='freq'))

    gen = f'gen_{len(done):06d}_{partition_id}'
    out_dir = os.path.join(root, gen)
    # a crashed previous attempt may have left partial parquet in this
    # generation dir (write_parquet appends UUID-named files, it does not
    # clear) — wiping first keeps the re-run's committed generation pure,
    # preserving the exactly-once contract instead of inflating counts
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    merged.write_parquet(out_dir)
    # commit order: state parquet durable → manifest → LATEST (readers
    # follow LATEST, so a crash between steps leaves the old state live);
    # both pointer files flip via temp-file + os.replace (atomic)
    _atomic_write(os.path.join(root, 'MANIFEST.json'),
                  json.dumps({'partitions': done + [partition_id]}))
    _atomic_write(os.path.join(root, 'LATEST'), gen)
    return {'partition': partition_id, 'skipped': False, 'generation': gen}


def bloom_bits_state(root: str) -> pd.DataFrame:
    """Current merged Bloom state as a sorted (bit_pos:int64) frame —
    KB-sized at any corpus size (the state IS the sketch), empty if no
    generation exists yet."""
    import pyarrow.parquet as pq
    cur = _latest(root)
    if cur is None:
        return pd.DataFrame({'bit_pos': pd.Series(dtype='int64')})
    return pq.read_table(cur).to_pandas()


def update_bloom_bits(root: str, partition_id: str, ds, id_col: str,
                      m: int = 16384, k: int = 4, hash_fn=None) -> dict:
    """Merge one crawl partition's Bloom membership bits into the running
    'seen before' state — the LLM-data counterpart of the token-count
    generation chain (daily-append crawl dedup: yesterday's ids live as a
    KB-sized bit set, today's ingest ORs its bits in and asks membership
    against the PREVIOUS state). Same manifest/atomic-pointer contract as
    ``update_token_counts``: exactly-once per partition_id, generation dir
    wiped on retry, parquet durable → MANIFEST → LATEST. Bloom merge is
    bit-OR, i.e. set union of bit positions, so delta ≡ full recompute
    bit-for-bit (pinned by test_incremental)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.sketches import bloom_bits

    os.makedirs(root, exist_ok=True)
    done = processed_partitions(root)
    if partition_id in done:
        return {'partition': partition_id, 'skipped': True,
                'generation': os.path.basename(_latest(root) or '')}

    delta = bloom_bits(ds, id_col, m=m, k=k, hash_fn=hash_fn)
    prev = bloom_bits_state(root)
    merged = sorted(set(prev['bit_pos'].tolist())
                    | set(delta['bit_pos'].tolist()))

    gen = f'gen_{len(done):06d}_{partition_id}'
    out_dir = os.path.join(root, gen)
    if os.path.isdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    # the state is KB-sized by construction (≤ m bit positions) — a
    # driver-side parquet write is the honest shape, not a Ray job
    pq.write_table(pa.Table.from_pydict(
        {'bit_pos': pa.array(merged, pa.int64())}),
        os.path.join(out_dir, 'bloom.parquet'))
    _atomic_write(os.path.join(root, 'MANIFEST.json'),
                  json.dumps({'partitions': done + [partition_id]}))
    _atomic_write(os.path.join(root, 'LATEST'), gen)
    return {'partition': partition_id, 'skipped': False, 'generation': gen}
