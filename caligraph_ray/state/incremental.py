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
