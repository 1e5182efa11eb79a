"""Property-based checks for the evaluation metrics and the MD chunking
data path.

Clustering metrics (B³, MUC, CEAF-e, NMI, ARI) over random clusterings:
* identical clusterings score perfect (1.0 where the metric defines it)
* all scores stay in their documented range
* B³ and CEAF-e are symmetric in precision↔recall under pred/gold swap
* sklearn-free NMI/ARI sanity: independent single-cluster vs singletons

chunk_listing_items invariants: every item appears in exactly one chunk,
order preserved, every chunk ≤ max_tokens (given any single item fits),
each chunk re-carries the context prefix.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

PURE = settings(max_examples=150, deadline=None)


@st.composite
def clustering_pair(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    pred = {i: draw(st.integers(0, 3)) for i in range(n)}
    gold = {i: draw(st.integers(0, 3)) for i in range(n)}
    return pred, gold


@PURE
@given(clustering_pair())
def test_metrics_ranges_and_perfect_scores(pair):
    from caligraph_ray.functions.metrics import (ari, b_cubed, ceaf_e, muc,
                                                 nmi)
    pred, gold = pair
    for fn in (b_cubed, ceaf_e, muc):
        out = fn(pred, gold)
        for k in ('precision', 'recall', 'f1'):
            assert 0.0 <= out[k] <= 1.0 + 1e-12, (fn.__name__, k, out)
    assert 0.0 <= nmi(pred, gold) <= 1.0 + 1e-12
    assert -1.0 - 1e-12 <= ari(pred, gold) <= 1.0 + 1e-12

    # perfect agreement (compare pred to itself)
    for fn in (b_cubed, ceaf_e):
        out = fn(pred, pred)
        assert abs(out['precision'] - 1.0) < 1e-12
        assert abs(out['recall'] - 1.0) < 1e-12
    assert abs(ari(pred, pred) - 1.0) < 1e-12 or len(set(pred.values())) <= 1


@PURE
@given(clustering_pair())
def test_metrics_pred_gold_symmetry(pair):
    from caligraph_ray.functions.metrics import b_cubed, ceaf_e, nmi
    pred, gold = pair
    a, b = b_cubed(pred, gold), b_cubed(gold, pred)
    assert abs(a['precision'] - b['recall']) < 1e-12
    assert abs(a['recall'] - b['precision']) < 1e-12
    a, b = ceaf_e(pred, gold), ceaf_e(gold, pred)
    assert abs(a['precision'] - b['recall']) < 1e-9
    assert abs(a['recall'] - b['precision']) < 1e-9
    assert abs(nmi(pred, gold) - nmi(gold, pred)) < 1e-12


def test_metrics_known_values():
    from caligraph_ray.functions.metrics import ari, b_cubed, nmi
    # one big pred cluster vs all-singleton gold, n=4 (textbook B³ values)
    pred = {i: 0 for i in range(4)}
    gold = {i: i for i in range(4)}
    out = b_cubed(pred, gold)
    assert abs(out['precision'] - 0.25) < 1e-12
    assert abs(out['recall'] - 1.0) < 1e-12
    assert nmi(pred, gold) == 0.0
    assert abs(ari(pred, gold)) < 1e-12


@st.composite
def listing_items(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    items = []
    for i in range(n):
        n_tok = draw(st.integers(min_value=0, max_value=40))
        items.append({'item_idx': i,
                      'tokens': [f'w{i}_{j}' for j in range(n_tok)],
                      'depth': draw(st.integers(0, 2)),
                      'ltype': draw(st.sampled_from(['list', 'table']))})
    return items


@PURE
@given(listing_items(), st.integers(min_value=0, max_value=400))
def test_chunk_listing_items_invariants(items, ctx_len):
    from caligraph_ray.stages.chunking import (MAX_ITEMS_PER_CHUNK,
                                               MAX_TOKENS_PER_CHUNK,
                                               MIN_ITEMS_PER_CHUNK,
                                               chunk_listing_items)
    context = [f'c{i}' for i in range(ctx_len)]
    chunks = chunk_listing_items(context, items)
    seen = []
    for ch in chunks:
        toks, idxs = ch['tokens'], ch['item_idxs']
        assert len(toks) <= MAX_TOKENS_PER_CHUNK   # incl. truncated context
        assert MIN_ITEMS_PER_CHUNK <= len(idxs) <= MAX_ITEMS_PER_CHUNK
        assert len(ch['labels']) == len(toks)      # label channel aligned
        if ctx_len <= MAX_TOKENS_PER_CHUNK - 30:
            assert toks[:ctx_len] == context       # context prefix carried
        seen.extend(idxs)
    # emitted items keep input order, appear once, and only token-bearing
    # items are eligible
    eligible = [it['item_idx'] for it in items if it['tokens']]
    assert seen == [i for i in eligible if i in set(seen)]
    assert len(seen) == len(set(seen))
