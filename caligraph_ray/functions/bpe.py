"""BPE merge training (Sennrich et al. 2016) — the tokenizer-training
operator of a training-data pipeline.

Industrial shape: the CORPUS pass (word frequencies) is distributed
(textstats.token_counts two-phase aggregation); the merge loop runs over
the collected word-frequency dim, which is vocabulary-sized (freq-prune
upstream at web scale — token_counts takes min_len/vocab filters).

Determinism contract (what makes the generated DuckDB oracle replay the
whole training loop bit-for-bit): word symbol state is a DOUBLE-space-
separated string ``  l  o  w  </w>  ``; pair counts are freq-weighted
adjacent-symbol counts; the best pair ranks by (count desc, pair asc); a
merge is ONE plain left-to-right string replace of `` a  b `` (single
flanking space, double interior space) with `` ab `` — the same greedy
non-overlapping semantics in Python ``str.replace`` and SQL ``replace``.

Why double spaces: with single-space separators, adjacent pattern
occurrences share a boundary space (`` b a b a `` → the first replace
consumes the space the second occurrence needs), so one replace pass
under-merges — not just on identical-symbol runs but on ANY immediately
adjacent occurrence (word ``baba``). With two spaces between symbols and
a one-space flank on the pattern, consecutive occurrences never share a
character, so a single left-to-right replace merges exactly the canonical
greedy non-overlapping occurrence set — bit-identical to Sennrich's
list-based merge, identical-symbol runs included (property-tested against
a list reference in tests/test_property_round3.py with NO exclusions).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

END = '</w>'


def word_sym(word: str) -> str:
    return '  ' + '  '.join(word) + f'  {END}  '


def _pat(pair: str) -> str:
    """Replace pattern for a single-space pair key 'a b': one flanking
    space each side, two interior — disjoint for adjacent occurrences."""
    return ' ' + pair.replace(' ', '  ') + ' '


def bpe_train_from_vocab(vocab: Dict[str, int],
                         n_merges: int) -> List[Tuple[str, str]]:
    """[(pair, merged)] learned merges, most-frequent first."""
    items: List[Tuple[str, int]] = [(word_sym(w), f) for w, f in vocab.items()]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Dict[str, int] = {}
        for sym, f in items:
            parts = sym.split()
            for a, b in zip(parts, parts[1:]):
                p = a + ' ' + b
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(((-c, p) for p, c in counts.items()))
        pair = best[1]
        merged = pair.replace(' ', '')
        merges.append((pair, merged))
        items = [(s.replace(_pat(pair), f' {merged} '), f) for s, f in items]
    return merges


def bpe_merges(docs_ds, n_merges: int = 10, text_col: str = 'text'):
    """documents Dataset → learned merge table (rank, pair, merged):
    distributed word counting, driver merge loop over the vocab dim."""
    import pandas as pd

    from ..stages.relational import collect_pandas
    from ..stages.textstats import token_counts

    vc = collect_pandas(token_counts(docs_ds, text_col=text_col))
    vocab = dict(zip(vc['token'], vc['freq'].astype(int)))
    merges = bpe_train_from_vocab(vocab, n_merges)
    return pd.DataFrame({
        'rank': pd.Series(range(1, len(merges) + 1), dtype='int64'),
        'pair': [p for p, _ in merges],
        'merged': [m for _, m in merges],
    })


def bpe_encode(word: str, merges: List[Tuple[str, str]]) -> List[str]:
    """Apply learned merges in rank order to one word (the inference side
    of the trainer; batched application belongs in a map_batches stage)."""
    sym = word_sym(word)
    for pair, merged in merges:
        sym = sym.replace(_pat(pair), f' {merged} ')
    return sym.split()


def bpe_segment_counts(docs_ds, n_merges: int = 10, id_col: str = 'doc_id',
                       text_col: str = 'text'):
    """Distributed BPE APPLICATION (the inference half of the lifecycle):
    learn ``n_merges`` merges from the corpus, then segment every document
    and emit (doc_id, n_bpe_tokens) — the token-budget signal a training
    pipeline prices data with.

    Vectorization trick: each doc becomes ONE padded symbol stream
    (concatenated per-word ``word_sym``s), and each merge is a single
    pandas ``str.replace(..., regex=False)`` over the whole column — no
    per-word Python loop in the replace chain. The stream is safe because
    (a) no learned pair's FIRST symbol can contain ``</w>`` (it is never
    word-final during training), and (b) concatenated word_syms leave four
    spaces between words while patterns carry single-space flanks, so a
    pattern can never straddle a word boundary. The merge table
    (``n_merges`` rows) broadcasts via ray.put; the segmentation map is
    stateless and streams."""
    import pandas as pd
    import ray

    from ..config import AGG_BATCH_SIZE
    from ..state.broadcast import get_broadcast

    merges_df = bpe_merges(docs_ds, n_merges=n_merges)
    pats = [(_pat(p), f' {m} ')
            for p, m in zip(merges_df['pair'], merges_df['merged'])]
    ref = ray.put(pats)

    def seg(df: pd.DataFrame) -> pd.DataFrame:
        pats_ = get_broadcast(ref)
        syms = df[text_col].map(
            lambda t: ''.join(word_sym(w) for w in t.split(' ') if w))
        for pat, rep in pats_:
            syms = syms.str.replace(pat, rep, regex=False)
        return pd.DataFrame({
            id_col: df[id_col],
            'n_bpe_tokens': syms.str.split().str.len().astype('int64'),
        })

    return docs_ds.map_batches(seg, batch_format='pandas',
                               batch_size=AGG_BATCH_SIZE)
