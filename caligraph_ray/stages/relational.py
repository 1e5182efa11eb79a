"""Generic relational operators, Ray-Data-first (SURVEY.md §2.4-2.6).

These back the reference's pandas-merge / Counter / most_common idioms
(impl/listing/extract.py J3-J4, O1-O3, A6-A7, A12-A14) as reusable stages:

* broadcast joins / semi / anti joins — small side via ``ray.put`` once,
  lookup inside ``map_batches`` (never a shuffle, never re-shipped per batch)
* two-phase aggregation — per-batch partial combine, then a small groupby
  (bounds all-to-all volume by #batches × per-batch key cardinality, the
  skew answer for head keys)
* per-group top-k / argmax / mode via keyed shuffles
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import AGG_BATCH_SIZE


def read_table(sf_dir: str, name: str, columns: Optional[List[str]] = None):
    """Column-pruned parquet read of a driver testdata table."""
    import ray.data as rd
    return rd.read_parquet(f'{sf_dir}/{name}.parquet', columns=columns)


def broadcast_join(ds, small_df: pd.DataFrame, left_on: str, right_on: str,
                   how: str = 'inner'):
    """Join a Dataset against a small dimension table: the dim is put in the
    object store once and merged per batch (J2/J4 pattern)."""
    ref = ray.put(small_df)

    class Joiner:
        def __init__(self):
            self.dim = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.dim, how=how, left_on=left_on, right_on=right_on)

    return ds.map_batches(Joiner, batch_format='pandas', batch_size=AGG_BATCH_SIZE,
                          concurrency=2)


def semi_anti_join(ds, keys, col: str, anti: bool = False):
    """Semi/anti join against a broadcast key set (reference anti-join idiom
    extract.py:286-289; at larger key cardinality the set becomes a Bloom
    filter shard — same shape)."""
    ref = ray.put(frozenset(keys))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        keyset = ray.get(ref)
        mask = batch[col].isin(keyset)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(fn, batch_format='pandas', batch_size=AGG_BATCH_SIZE)


def two_phase_count(ds, keys: Sequence[str], alias: str = 'cnt'):
    """groupby(keys).count() with per-batch partial combine."""
    from ray.data.aggregate import Sum
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys).group_by(keys).aggregate([([], 'count_all')])
        return g.rename_columns(keys + [alias])

    pre = ds.map_batches(partial, batch_format='pyarrow', batch_size=AGG_BATCH_SIZE)
    return pre.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def two_phase_sum(ds, keys: Sequence[str], value_col: str, alias: str = 'total'):
    """groupby(keys).sum(value) with per-batch partial combine."""
    from ray.data.aggregate import Sum
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys + [value_col]).group_by(keys).aggregate([(value_col, 'sum')])
        return g.rename_columns(keys + [alias])

    pre = ds.map_batches(partial, batch_format='pyarrow', batch_size=AGG_BATCH_SIZE)
    return pre.groupby(keys).aggregate(Sum(alias, alias_name=alias))


def topk_per_group(ds, group_key: str, sort_cols: List[str],
                   ascending: List[bool], k: int):
    """Per-group top-k (O1): keyed shuffle + in-group sort/head. Ties are
    broken by the full sort_cols list, so callers must make it total."""
    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_cols, ascending=ascending, kind='mergesort').head(k)
    return ds.groupby(group_key).map_groups(head, batch_format='pandas')


def mode_per_group(ds, group_key: str, value_col: str, alias: str = 'mode'):
    """Most frequent value per group, ties → lexicographic min (O3,
    reference Counter.most_common majority vote). Two-phase: pair counts
    first, then argmax over the (small) distinct-pair table."""
    counts = two_phase_count(ds, [group_key, value_col], alias='cnt')

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['cnt', value_col], ascending=[False, True], kind='mergesort')
        return pd.DataFrame({group_key: [g.iloc[0][group_key]], alias: [g.iloc[0][value_col]]})

    return counts.groupby(group_key).map_groups(argmax, batch_format='pandas')


def functional_keys(ds, key_col: str, subject_col: str, threshold: float = 0.95):
    """A12 (reference heuristics.py:163-184): a key is functional iff ≥
    threshold of its subjects have exactly one row. Returns
    (key, n_subjects, functional_ratio)."""
    per_subj = two_phase_count(ds, [key_col, subject_col], alias='n')

    def ratio(g: pd.DataFrame) -> pd.DataFrame:
        ones = int((g['n'] == 1).sum())
        total = len(g)
        return pd.DataFrame({key_col: [g.iloc[0][key_col]],
                             'n_subjects': [total],
                             'functional_ratio': [round(ones / total, 6)]})

    return per_subj.groupby(key_col).map_groups(ratio, batch_format='pandas')
