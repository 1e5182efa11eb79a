"""Temporal / ordered-data operators: as-of join, range join,
sessionization, per-key rolling windows.

These are operators the reference lacks but a large-scale training-data /
event pipeline needs (SURVEY.md §2 additions; the as-of and range joins are
the custom operators called out in the build brief). All are expressed as
compositions of the repo's one-shuffle primitives:

* co-partition both sides on the equality key with ONE tagged-union
  exchange (``bucketed_map``), then run the vectorized pandas kernel
  (``merge_asof`` / interval mask / ``groupby`` + ``rolling``) inside each
  bucket — complete key groups per bucket is the only partitioning
  assumption, the same contract as ``shuffle_join``.
* per-key skew: a single hot key lands in one bucket; salt upstream if one
  key's rows exceed a task's heap (documented in relational.bucketed_map).

Timestamps travel the exchange as int64 epoch-micros and are restored on
emit. The tagged union ships ARROW blocks with typed null padding (never
object columns); each bucket splits sides arrow-side before converting to
pandas, so null-free int64 payloads stay exact through the exchange.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import AGG_BATCH_SIZE


def _ts_to_int(s: pd.Series) -> pd.Series:
    """datetime64[*] → nullable Int64 epoch-micros (no-op for integer
    columns). tz-aware columns are converted to UTC then made naive
    (pandas 2.x refuses a direct astype); NaT becomes <NA>, never the iNaT
    sentinel (-2^63) — a NULL timestamp must not sort/match as year
    -290308."""
    if isinstance(s.dtype, pd.DatetimeTZDtype):
        s = s.dt.tz_convert('UTC').dt.tz_localize(None)
    if pd.api.types.is_datetime64_any_dtype(s):
        vals = s.astype('datetime64[us]').astype('int64')   # NaT → iNaT
        return vals.astype('Int64').mask(s.isna())
    return s.astype('Int64')


def _tagged_union(left_ds, right_ds, key_left: str, key_right: str,
                  lcols: List[str], rcols: List[str],
                  ts_left: str, ts_right: str, coarse: int):
    """Project both sides onto a shared ARROW schema with a ``_side`` tag,
    the equality key as ``_k``, the (int64) order column as ``_ts`` and the
    exchange key precomputed as ``_coarse`` — one Dataset that travels one
    ``bucketed_map_arrow`` exchange. The other side's payload columns are
    TYPED null padding (pa.nulls), never object columns: int64 stays int64
    through the exchange, and the bucket fn drops the padded values
    arrow-side before any pandas conversion, so nothing ever demotes to
    float64 (exactness above 2^53 preserved)."""
    from .relational import _coarse_key

    def _pa_type(t):
        # Ray reports pandas-backed blocks' types as numpy/Python types;
        # object (incl. all-null) columns travel as string
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, ValueError, pa.ArrowNotImplementedError):
            return pa.string()

    ltypes = {n: _pa_type(t) for n, t in
              zip(left_ds.schema().names, left_ds.schema().types)}
    rtypes = {n: _pa_type(t) for n, t in
              zip(right_ds.schema().names, right_ds.schema().types)}
    clash = [c for c in rcols if c in lcols]
    if clash:
        # one transit column per name cannot carry two sides' payloads;
        # callers rename upstream (the output would collide anyway)
        raise ValueError(
            f'right_cols {clash} also exist on the left side — rename the '
            f'right columns before the join (select_columns + map_batches)')
    all_cols = lcols + [c for c in rcols if c not in lcols]
    types = {**{c: rtypes[c] for c in rcols}, **{c: ltypes[c] for c in lcols}}
    # the two sides' key columns must concat to ONE type: int64 when both
    # are integers, else string
    both_int = (pa.types.is_integer(ltypes[key_left])
                and pa.types.is_integer(rtypes[key_right]))
    ktype = pa.int64() if both_int else pa.string()

    def tag(side: str, key_col: str, ts_col: str, own: List[str]):
        def fn(batch: pd.DataFrame) -> pa.Table:
            from .relational import pad_to_union
            n = len(batch)
            names, cols = pad_to_union(batch, all_cols, types, set(own))
            if both_int:
                key = batch[key_col]
            else:
                # canonical stringify (not astype(str)): a null must not
                # become the literal 'nan'/'None', and a numeric column
                # must render identically from an int64 block and its
                # null-demoted float64 sibling ('1' vs '1.0')
                from .relational import _canon_key_str
                key = _canon_key_str(batch[key_col]).where(
                    batch[key_col].notna(), None)
            names += ['_side', '_k', '_ts', '_coarse']
            cols += [
                pa.nulls(n, pa.string()).fill_null(side),
                pa.array(key, type=ktype, from_pandas=True),
                pa.array(_ts_to_int(batch[ts_col]), type=pa.int64(),
                         from_pandas=True),
                pa.array(_coarse_key(pd.DataFrame({'_k': key}), ['_k'],
                                     coarse), type=pa.int32()),
            ]
            return pa.Table.from_arrays(cols, names=names)
        return fn

    return left_ds.map_batches(tag('l', key_left, ts_left, lcols),
                               batch_format='pandas',
                               batch_size=AGG_BATCH_SIZE).union(
        right_ds.map_batches(tag('r', key_right, ts_right, rcols),
                             batch_format='pandas',
                             batch_size=AGG_BATCH_SIZE))


def _split_sides(t: "pa.Table", lkeep: List[str], rkeep: List[str]):
    """Bucket table → (left_df, right_df), converting each side to pandas
    only AFTER selecting its own (null-free) columns."""
    import pyarrow.compute as pc
    mask = pc.equal(t.column('_side'), 'l')
    l = t.filter(mask).select(lkeep).to_pandas()
    r = t.filter(pc.invert(mask)).select(rkeep).to_pandas()
    return l, r


def _norm_transit(df: pd.DataFrame) -> pd.DataFrame:
    """After the null filters: each side converted to pandas independently,
    so a side whose slice held nulls came back float64 while the other
    stayed int64 — pandas merge/merge_asof refuses mismatched key dtypes.
    Post-filter the values are whole numbers < 2^53, so the cast is exact."""
    out = {'_ts': df['_ts'].astype('int64')}
    if pd.api.types.is_float_dtype(df['_k']):
        out['_k'] = df['_k'].astype('int64')
    return df.assign(**out)


def asof_join(left_ds, right_ds, key_left: str, key_right: str,
              ts_left: str, ts_right: str,
              right_cols: Sequence[str], direction: str = 'backward',
              inner: bool = True):
    """As-of join: for every left row, the single right row of the same key
    whose timestamp is the latest ≤ the left timestamp (``backward``; the
    DuckDB ``ASOF JOIN`` contract) or earliest ≥ (``forward``).

    Right-side timestamp ties must be resolved upstream (one row per
    (key, ts)); with ties the winner is the last row in (ts, input) order.
    Returns the left columns plus ``right_cols``; ``inner`` drops left rows
    without a match (ASOF LEFT JOIN when False). Match/no-match is decided
    by an internal marker, not by payload nullness — a matched right row
    with NULL payload columns survives an inner join, as in SQL."""
    from .relational import bucketed_map_arrow, default_coarse
    lcols = list(left_ds.schema().names)
    rkeep = [c for c in right_cols]
    coarse = default_coarse()
    tagged = _tagged_union(left_ds, right_ds, key_left, key_right,
                           lcols, rkeep, ts_left, ts_right, coarse)

    def merge(t) -> pd.DataFrame:
        l, r = _split_sides(t, lcols + ['_k', '_ts'], rkeep + ['_k', '_ts'])
        if not len(l):
            return pd.DataFrame()
        # SQL comparison semantics: a NULL key or NULL timestamp matches
        # nothing (pandas would instead raise on null merge_asof keys /
        # join NaN==NaN); unmatchable left rows survive only a left join
        l_ok = l['_k'].notna() & l['_ts'].notna()
        l_null = l[~l_ok]
        l = _norm_transit(l[l_ok])
        r = _norm_transit(r[r['_k'].notna() & r['_ts'].notna()])
        l = l.sort_values(['_ts'], kind='mergesort')
        r = r.sort_values(['_ts'], kind='mergesort').reset_index(drop=True)
        # only an int64 row POSITION travels through merge_asof: unmatched
        # left rows NaN-fill the merged column (demoting it to float64), but
        # a row index is always < 2^53 so the demotion is lossless — the
        # actual right payloads are gathered afterwards by position, keeping
        # int64 columns exact (the old object-dtype exchange's guarantee)
        rpos = r[['_k', '_ts']].copy()
        rpos['_ri'] = np.arange(len(rpos), dtype=np.int64)
        merged = pd.merge_asof(
            l, rpos, on='_ts', by='_k', direction=direction,
            allow_exact_matches=True)
        matched = merged['_ri'].notna()
        if inner:
            merged = merged[matched]
            idx = merged['_ri'].to_numpy(dtype=np.int64)
            for c in rkeep:
                merged[c] = r[c].to_numpy()[idx] if len(r) else None
            return merged[lcols + rkeep]
        idx = merged['_ri'].fillna(0).to_numpy(dtype=np.int64)
        m = matched.to_numpy()
        for c in rkeep:
            if len(r) and m.all():
                merged[c] = r[c].to_numpy()[idx]
            else:
                vals = np.empty(len(merged), dtype=object)
                if len(r):
                    vals[m] = r[c].to_numpy()[idx[m]]
                vals[~m] = None
                merged[c] = vals
        out = merged[lcols + rkeep]
        if len(l_null):   # left join keeps null-key/null-ts rows unmatched
            pad = l_null[lcols].copy()
            for c in rkeep:
                pad[c] = None
            out = pd.concat([out, pad], ignore_index=True)
        return out

    return bucketed_map_arrow(tagged, merge, coarse=coarse)


def range_join(left_ds, right_ds, key_left: str, key_right: str,
               ts_left: str, ts_right: str,
               right_cols: Sequence[str],
               low_us: int, high_us: int):
    """Interval join: all (left, right) pairs of the same key with
    ``low_us ≤ ts_left − ts_right < high_us`` (timestamps in micros).
    One co-partitioning exchange, then a per-bucket vectorized equi-merge +
    interval mask."""
    from .relational import bucketed_map_arrow, default_coarse
    lcols = list(left_ds.schema().names)
    rkeep = [c for c in right_cols]
    coarse = default_coarse()
    tagged = _tagged_union(left_ds, right_ds, key_left, key_right,
                           lcols, rkeep, ts_left, ts_right, coarse)

    def merge(t) -> pd.DataFrame:
        l, r = _split_sides(t, lcols + ['_k', '_ts'], rkeep + ['_k', '_ts'])
        # NULL key/ts pairs with nothing in SQL; pandas merge would join
        # NaN == NaN
        l = _norm_transit(l[l['_k'].notna() & l['_ts'].notna()])
        r = _norm_transit(r[r['_k'].notna() & r['_ts'].notna()])
        if not len(l) or not len(r):
            return pd.DataFrame()
        merged = l.merge(r, on='_k', suffixes=('', '_r'))
        delta = merged['_ts'] - merged['_ts_r']
        mask = (delta >= low_us) & (delta < high_us)
        return merged.loc[mask, lcols + rkeep]

    return bucketed_map_arrow(tagged, merge, coarse=coarse)


def sessionize(events_ds, key_col: str = 'user_id', ts_col: str = 'ts',
               order_col: str = 'event_id', gap_us: int = 30 * 60 * 1_000_000):
    """Gap-based sessionization: per key, rows ordered by (ts, order_col);
    a gap > ``gap_us`` micros starts a new session. Returns one row per
    session: (key, session_idx [1-based per key], n_events, start_ts,
    end_ts) with timestamps restored to datetime64[us]."""
    from .relational import bucketed_map

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: batch[key_col],
            '_ts': _ts_to_int(batch[ts_col]),
            order_col: batch[order_col],
        })

    prepped = events_ds.map_batches(prep, batch_format='pandas',
                                    batch_size=AGG_BATCH_SIZE)

    def sess(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([key_col, '_ts', order_col], kind='mergesort')
        kv, ks = b[key_col], b[key_col].shift()
        # NaN.ne(NaN) is True, which would fragment the NULL-key partition
        # into one session per row; SQL PARTITION BY keeps NULLs as ONE
        # partition (NULLs sort last, NULL gaps never exceed gap_us)
        new_key = kv.ne(ks) & ~(kv.isna() & ks.isna())
        gap = b['_ts'] - b['_ts'].shift()
        new_sess = (new_key | (gap > gap_us)).fillna(False).to_numpy()
        sess_global = np.cumsum(new_sess)
        b = b.assign(_sg=sess_global)
        g = b.groupby([key_col, '_sg'], sort=False, dropna=False)
        out = g.agg(n_events=('_ts', 'size'), start_ts=('_ts', 'min'),
                    end_ts=('_ts', 'max')).reset_index()
        out['session_idx'] = out.groupby(
            key_col, sort=False, dropna=False).cumcount() + 1
        for c in ('start_ts', 'end_ts'):   # float-safe: NaN → NaT
            out[c] = pd.to_datetime(out[c], unit='us').astype('datetime64[us]')
        return out[[key_col, 'session_idx', 'n_events', 'start_ts', 'end_ts']]

    return bucketed_map(prepped, [key_col], sess)


def rolling_window(events_ds, key_col: str = 'user_id', ts_col: str = 'ts',
                   order_col: str = 'event_id', value_col: str = 'value',
                   window_rows: int = 4, cents: bool = True):
    """Per-key rolling-window aggregate over (ts, order_col) order:
    sum + count of the current row and the ``window_rows − 1`` preceding
    rows (the SQL ``ROWS BETWEEN n PRECEDING AND CURRENT ROW`` frame).
    With ``cents`` the value is floored to integer cents first, so the
    rolling sums are exact integers (no float summation-order ambiguity
    between engines)."""
    from .relational import bucketed_map

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].astype('float64')
        vals = np.floor(v.to_numpy() * 100).astype('int64') if cents \
            else v.to_numpy()
        return pd.DataFrame({
            key_col: batch[key_col],
            '_ts': _ts_to_int(batch[ts_col]),
            order_col: batch[order_col],
            '_v': vals,
        })

    prepped = events_ds.map_batches(prep, batch_format='pandas',
                                    batch_size=AGG_BATCH_SIZE)

    def roll(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([key_col, '_ts', order_col], kind='mergesort')
        # dropna=False: the default would omit NULL-key rows from the
        # rolling result, NaN-fill them on alignment and break the int64
        # cast; SQL windows over the NULL partition like any other
        g = b.groupby(key_col, sort=False, dropna=False)['_v']
        rsum = g.rolling(window_rows, min_periods=1).sum() \
            .reset_index(drop=True)
        if cents:   # integer-cents mode: sums are exact integers
            rsum = rsum.astype('int64')
        rcnt = g.rolling(window_rows, min_periods=1).count() \
            .reset_index(drop=True).astype('int64')
        out = b.reset_index(drop=True)
        out['roll_sum'] = rsum
        out['roll_n'] = rcnt
        return out[[key_col, order_col, 'roll_sum', 'roll_n']]

    return bucketed_map(prepped, [key_col], roll)
