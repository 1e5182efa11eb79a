"""Redirect / disambiguation canonicalization (D2, reference
impl/dbpedia/resource.py:290-305): resolve names through the redirect map
(chain-chased up to ``max_hops``) with the spelling guard — the fold is
accepted only when levenshtein(original, final) ≤ ``guard`` (a "spelling
redirect"); otherwise the ORIGINAL name is kept, exactly as
``resolve_spelling_redirect`` does when the redirect points at a completely
different resource.

THE canonical-surface normalization step: applied to mention targets before
any alias grouping, so distinct surfaces redirecting to one entity merge.
The redirect dim is broadcast once (ray.put; at Wikipedia scale ~10M pairs
it is the same budget class as the alias index — shard by hash(src) or use
relational.shuffle_join twice when it outgrows one object)."""

from __future__ import annotations

from typing import Dict, Optional

import pandas as pd
import pyarrow as pa
import ray

from ..config import AGG_BATCH_SIZE


def levenshtein(a: str, b: str, cap: Optional[int] = None) -> int:
    """Edit distance with optional early-exit cap (returns cap+1 when the
    true distance exceeds cap — mirrors the capped call in the reference)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        bj = b[j - 1]
        row_min = cur[0]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            row_min = min(row_min, cur[i])
        if cap is not None and row_min > cap:
            return cap + 1
        prev = cur
    d = prev[la]
    # the row-min early exit can miss a final distance above the cap (some
    # row still held a small value); clamp so the documented "cap+1 when
    # true distance exceeds cap" contract holds on every path
    return d if cap is None or d <= cap else cap + 1


def resolve_name(name: str, redirects: Dict[str, str], max_hops: int = 2,
                 guard: int = 2) -> str:
    """One name through the redirect chain + spelling guard (pure fn —
    the semantics the distributed fold and the SQL oracle both implement)."""
    final = name
    for _ in range(max_hops):
        nxt = redirects.get(final)
        if nxt is None or nxt == final:
            break
        final = nxt
    if final == name:
        return name
    if levenshtein(name, final, guard) > guard:
        return name   # redirect to a completely different resource: keep
    return final


def fold_redirects(ds, redirects_ds, col: str = 'name',
                   src_col: str = 'src', tgt_col: str = 'tgt',
                   out_col: Optional[str] = None,
                   max_hops: int = 2, guard: int = 2):
    """Fold the ``col`` column of ``ds`` through the redirect table
    (broadcast once, chased ≤ max_hops, spelling-guarded). Null values pass
    through. ``out_col`` defaults to replacing ``col`` in place."""
    out_col = out_col or col
    from .relational import collect_rows
    rows = collect_rows(redirects_ds.select_columns([src_col, tgt_col]))
    rmap = {r[src_col]: r[tgt_col] for r in rows}
    ref = ray.put(rmap)

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import get_broadcast
        rm = get_broadcast(ref)
        vals = batch[col]
        # only names that ARE redirect sources can change, and corpora
        # repeat surfaces massively: chase + Levenshtein-guard once per
        # distinct redirecting name in the batch, not once per row
        uniq = {n for n in vals.dropna().unique()
                if isinstance(n, str) and n in rm}
        mapping = {n: resolve_name(n, rm, max_hops, guard) for n in uniq}
        if mapping:
            m = vals.map(mapping)
            batch[out_col] = m.where(m.notna(), vals)
        else:
            batch[out_col] = vals
        return batch

    return ds.map_batches(fold, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
