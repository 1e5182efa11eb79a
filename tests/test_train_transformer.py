"""Gradient-training tests (reference lifecycle: HF Trainer fine-tune,
mention_detection/__init__.py:17-49; bi-encoder fit, biencoder.py:15-112):

1. the micro-autodiff's backward through the FULL TinyTransformer forward
   (embedding gather → multi-head attention → layer-norms → GELU FFN →
   masked mean pool → L2 normalize → InfoNCE) matches central finite
   differences coordinate-wise;
2. seeded end-to-end training reduces the loss and lifts held-out
   retrieval recall over the untrained seam on a synonym task that hash
   embeddings cannot solve (zero token overlap between pair sides);
3. the trained weights dropped through the matcher factory seams lift
   val ME-F1 over the identical UNTRAINED model — deterministically.
"""

import numpy as np
import pytest

from caligraph_ray.functions import autodiff as ad
from caligraph_ray.functions.tiny_transformer import TinyTransformer
from caligraph_ray.functions.train_transformer import (
    _encode, _params_of, info_nce, recall_at_k, train_biencoder)

# mention-side tokens share NOTHING with their entity-side twins: an
# untrained hash-token model has no lexical signal, only a LEARNED
# alignment can solve retrieval over these pairs
_SYN = {'crimson': 'red', 'azure': 'blue', 'amber': 'yellow',
        'raven': 'bird', 'lupine': 'wolf', 'vulpine': 'fox',
        'feline': 'cat', 'canine': 'dog'}


def _synonym_split(seed: int = 5):
    keys = sorted(_SYN)
    combos = [(a, b) for a in keys for b in keys if a != b]
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(combos))
    pairs = [(f'{combos[i][0]} {combos[i][1]}',
              f'{_SYN[combos[i][0]]} {_SYN[combos[i][1]]}')
             for i in order]
    return pairs[:40], pairs[40:52]   # train, val (disjoint combos)


def _tiny():
    return TinyTransformer(dim=8, n_heads=2, n_layers=1, ffn=16,
                           vocab=64, max_len=6, seed=3)


def _loss_of(model, ps, layers, ta, tb):
    return info_nce(_encode(model, ps, layers, ta),
                    _encode(model, ps, layers, tb))


def test_autodiff_matches_finite_differences():
    model = _tiny()
    ps, layers = _params_of(model)
    ta = ['alpha beta', 'gamma delta epsilon', 'zeta']
    tb = ['one two', 'three', 'four five six']
    loss = _loss_of(model, ps, layers, ta, tb)
    ad.backward(loss)
    rng = np.random.RandomState(0)
    eps = 1e-6
    for name in ('tok_emb', 'l0.wq', 'l0.wk', 'l0.wv', 'l0.wo',
                 'l0.w1', 'l0.w2', 'l0.g1', 'l0.b1', 'l0.g2', 'l0.b2'):
        p = ps[name]
        assert p.g is not None, name
        flat, gflat = p.v.reshape(-1), p.g.reshape(-1)
        for j in rng.choice(flat.size, size=4, replace=False):
            orig = flat[j]
            flat[j] = orig + eps
            lp = float(_loss_of(model, ps, layers, ta, tb).v)
            flat[j] = orig - eps
            lm = float(_loss_of(model, ps, layers, ta, tb).v)
            flat[j] = orig
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - gflat[j]) <= 1e-5 + 1e-4 * abs(fd), \
                (name, int(j), fd, float(gflat[j]))


def test_training_reduces_loss_and_lifts_heldout_recall():
    train, val = _synonym_split()
    queries = [m for m, _ in val]
    golds = [e for _, e in val]
    entities = sorted({e for _, e in train} | set(golds))

    base = TinyTransformer(dim=32, seed=13)
    r_untrained = recall_at_k(base, queries, golds, entities, k=4)

    model = TinyTransformer(dim=32, seed=13)
    hist = train_biencoder(model, train, epochs=12, batch_size=16,
                           lr=3e-3, seed=13)
    assert hist[-1] < hist[0] * 0.5, hist
    r_trained = recall_at_k(model, queries, golds, entities, k=4)
    assert r_trained > r_untrained, (r_trained, r_untrained)
    assert r_trained >= 0.5, r_trained

    # determinism: same seed → bit-identical weights and history
    model2 = TinyTransformer(dim=32, seed=13)
    hist2 = train_biencoder(model2, train, epochs=12, batch_size=16,
                            lr=3e-3, seed=13)
    assert hist2 == hist
    assert all(np.array_equal(a[k], b[k])
               for a, b in zip(model.layers, model2.layers) for k in a)
    assert np.array_equal(model.tok_emb, model2.tok_emb)


def test_trained_matcher_beats_untrained_seam_on_val_f1(ray_session):
    import pandas as pd
    import ray

    from caligraph_ray.pipelines.matcher import (
        BiEncoderCosineReranker, BiEncoderEmbedder, ThresholdedScoredMatcher,
        TrainedBiEncoderMatcher)
    from caligraph_ray.pipelines.registry import make_trainable_matcher

    train, val = _synonym_split()

    def corpus_of(pairs, base_uid):
        return ray.data.from_pandas(pd.DataFrame({
            'mention_uid': np.arange(base_uid, base_uid + len(pairs)),
            'label': [m for m, _ in pairs],
            'gold': [e for _, e in pairs]}))

    train_ds = corpus_of(train, 0).materialize()
    val_ds = corpus_of(val, 1000).materialize()
    ents = sorted({e for _, e in train} | {e for _, e in val})

    untrained_model = TinyTransformer(dim=32, seed=13)
    baseline = ThresholdedScoredMatcher(
        entity_labels=ents,
        embedder_factory=lambda: BiEncoderEmbedder(untrained_model),
        reranker_factory=lambda: BiEncoderCosineReranker(untrained_model))
    baseline.train(train_ds)
    f1_untrained = baseline._evaluate(
        baseline.MODE_EVAL, val_ds)['metrics']['f1']

    trained = make_trainable_matcher('scored-trained', entity_labels=ents,
                                     epochs=12, batch_size=16)
    assert isinstance(trained, TrainedBiEncoderMatcher)
    report = trained.train(train_ds, eval_on_train=True)
    assert report['train']['metrics']['f1'] > 0
    f1_trained = trained._evaluate(
        trained.MODE_EVAL, val_ds)['metrics']['f1']
    assert f1_trained > f1_untrained, (f1_trained, f1_untrained)

    # deterministic: retraining reproduces threshold and predictions
    again = make_trainable_matcher('scored-trained', entity_labels=ents,
                                   epochs=12, batch_size=16)
    again.train(train_ds)
    assert again.threshold == trained.threshold
    assert again.predict(again.MODE_EVAL, val_ds) == \
        trained.predict(trained.MODE_EVAL, val_ds)


def test_token_classifier_grad_matches_finite_differences():
    from caligraph_ray.functions.train_transformer import _encode_tokens

    model = _tiny()
    ps, layers = _params_of(model)
    rng0 = np.random.RandomState(1)
    head = ad.param(rng0.randn(model.dim, 2) / np.sqrt(model.dim))
    ps['head'] = head
    toks = [['alpha', 'beta', 'gamma'], ['delta'], ['eps', 'zeta']]
    tgt = np.array([[1, 0, 1], [0, 0, 0], [1, 0, 0]])
    val = np.array([[1, 1, 0], [1, 0, 0], [1, 1, 0]], dtype=float)

    def loss_of():
        x, mask = _encode_tokens(model, ps, layers, toks)
        return ad.cross_entropy_tokens(ad.matmul(x, head), tgt, val * mask)

    loss = loss_of()
    ad.backward(loss)
    rng = np.random.RandomState(0)
    eps = 1e-6
    for name in ('head', 'tok_emb', 'l0.wv', 'l0.g2'):
        p = ps[name]
        flat, gflat = p.v.reshape(-1), p.g.reshape(-1)
        for j in rng.choice(flat.size, size=4, replace=False):
            orig = flat[j]
            flat[j] = orig + eps
            lp = float(loss_of().v)
            flat[j] = orig - eps
            lm = float(loss_of().v)
            flat[j] = orig
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - gflat[j]) <= 1e-5 + 1e-4 * abs(fd), (name, int(j))


def _md_chunks(rng, n, subj_vocab, ctx_vocab):
    """Synthetic MD chunks: subject tokens from one vocabulary, background
    from another, first token an ignored context marker."""
    chunks = []
    for _ in range(n):
        toks, labs = ['[CTX]'], [-1]
        for _ in range(rng.randint(4, 9)):
            if rng.rand() < 0.4:
                toks.append(subj_vocab[rng.randint(len(subj_vocab))])
                labs.append(1)
            else:
                toks.append(ctx_vocab[rng.randint(len(ctx_vocab))])
                labs.append(0)
        chunks.append((toks, labs))
    return chunks


def test_token_classifier_training_lifts_f1():
    from caligraph_ray.functions.train_transformer import (
        TokenClassifier, train_token_classifier)

    rng = np.random.RandomState(11)
    subj = [f'name{i}' for i in range(12)]
    ctx = [f'word{i}' for i in range(12)]
    train = _md_chunks(rng, 60, subj, ctx)
    val = _md_chunks(rng, 20, subj, ctx)

    def token_f1(clf):
        tp = fp = fn = 0
        preds = clf.predict_batch([t for t, _ in val])
        for (toks, labs), pred in zip(val, preds):
            for lab, pr in zip(labs, pred):
                if lab < 0:
                    continue
                tp += int(lab == 1 and pr == 1)
                fp += int(lab == 0 and pr == 1)
                fn += int(lab == 1 and pr == 0)
        return 2 * tp / max(2 * tp + fp + fn, 1)

    base_model = TinyTransformer(dim=32, seed=13)
    rng0 = np.random.RandomState(14)
    untrained = TokenClassifier(
        base_model, rng0.randn(32, 2) / np.sqrt(32))
    f1_untrained = token_f1(untrained)

    model = TinyTransformer(dim=32, seed=13)
    clf, hist = train_token_classifier(model, train, epochs=10,
                                       batch_size=16, seed=13)
    assert hist[-1] < hist[0] * 0.5, hist
    f1_trained = token_f1(clf)
    assert f1_trained > f1_untrained, (f1_trained, f1_untrained)
    assert f1_trained >= 0.9, f1_trained

    # determinism
    clf2, hist2 = train_token_classifier(TinyTransformer(dim=32, seed=13),
                                         train, epochs=10, batch_size=16,
                                         seed=13)
    assert hist2 == hist
    assert np.array_equal(clf2.head, clf.head)


def test_md_predict_tokens_distributed_matches_local(ray_session):
    import pandas as pd
    import ray

    from caligraph_ray.functions.train_transformer import (
        TokenClassifier, restore_weights, snapshot_weights,
        train_token_classifier)
    from caligraph_ray.stages.ed import md_predict_tokens

    rng = np.random.RandomState(11)
    subj = [f'name{i}' for i in range(12)]
    ctx = [f'word{i}' for i in range(12)]
    train = _md_chunks(rng, 40, subj, ctx)
    clf, _ = train_token_classifier(TinyTransformer(dim=32, seed=13),
                                    train, epochs=6, seed=13)

    items = _md_chunks(rng, 25, subj, ctx)
    df = pd.DataFrame({'item_id': np.arange(25, dtype='int64'),
                       'tokens': [t for t, _ in items]})
    out = md_predict_tokens(ray.data.from_pandas(df).repartition(3),
                            model_weights=snapshot_weights(clf.model),
                            head=clf.head).to_pandas()
    got = {int(r['item_id']): list(r['md_tags'])
           for _, r in out.iterrows()}
    want = {i: pred for i, pred in
            enumerate(clf.predict_batch([t for t, _ in items]))}
    assert got == want

    # weight snapshot round-trip is exact
    rt = restore_weights(snapshot_weights(clf.model))
    assert np.array_equal(rt.tok_emb, clf.model.tok_emb)
    assert all(np.array_equal(a[k], b[k]) for a, b in
               zip(rt.layers, clf.model.layers) for k in a)


def test_crossencoder_training_separates_pairs():
    from caligraph_ray.functions.tiny_transformer import TransformerCrossScorer
    from caligraph_ray.functions.train_transformer import (
        TrainedCrossScorer, train_crossencoder)

    train_pairs, val_pairs = _synonym_split()
    rng = np.random.RandomState(3)

    def with_negatives(pairs):
        out = []
        ents = [e for _, e in pairs]
        for i, (m, e) in enumerate(pairs):
            out.append((m, e, 1))
            j = (i + 1 + rng.randint(len(pairs) - 1)) % len(pairs)
            out.append((m, ents[j], 0))
        return out

    train = with_negatives(train_pairs)
    val = with_negatives(val_pairs)

    def accuracy(score_pair):
        ok = 0
        for m, e, lab in val:
            ok += int((score_pair(m, e) >= 0.5) == bool(lab))
        return ok / len(val)

    untrained = TransformerCrossScorer(dim=32, seed=13)
    acc_untrained = accuracy(untrained.score_pair)

    scorer, hist = train_crossencoder(TinyTransformer(dim=32, seed=13),
                                      train, epochs=12, batch_size=16,
                                      seed=13)
    assert hist[-1] < hist[0] * 0.5, hist
    acc_trained = accuracy(scorer.score_pair)
    assert acc_trained > acc_untrained, (acc_trained, acc_untrained)
    assert acc_trained >= 0.8, acc_trained

    # deterministic
    scorer2, hist2 = train_crossencoder(TinyTransformer(dim=32, seed=13),
                                        train, epochs=12, batch_size=16,
                                        seed=13)
    assert hist2 == hist and np.array_equal(scorer2.head, scorer.head)


def test_flagship_runs_on_trained_models(ray_session, small_corpus):
    """The full KG pipeline on LEARNED weights: train the bi-encoder on
    the corpus's own wikilink supervision, drop it through run_flagship's
    factory seams, and verify the scored pipeline still produces the
    deterministic triple set (wikilinked mentions bypass scoring, so
    triples from linked mentions are invariant to the model swap)."""
    import ray

    from caligraph_ray.pipelines.flagship import run_flagship
    from caligraph_ray.pipelines.matcher import (BiEncoderCosineReranker,
                                                 BiEncoderEmbedder)
    from caligraph_ray.functions.train_transformer import train_biencoder
    from caligraph_ray.stages.alias import explode_mentions
    from caligraph_ray.stages.html_extract import items_view, parse_pages

    pages = ray.data.from_arrow(small_corpus)
    m = explode_mentions(items_view(parse_pages(pages))).to_pandas()
    m = m[m['name'].notna() & (m['label'] != '')]
    pairs = list(zip(m['label'].head(64), m['name'].head(64)))

    model = TinyTransformer(dim=32, seed=13)
    train_biencoder(model, pairs, epochs=2, batch_size=16, seed=13)

    trained = run_flagship(
        ray.data.from_arrow(small_corpus), linking='scored',
        embedder_factory=lambda: BiEncoderEmbedder(model),
        reranker_factory=lambda: BiEncoderCosineReranker(model)).to_pandas()
    base = run_flagship(ray.data.from_arrow(small_corpus),
                        linking='scored').to_pandas()
    assert len(trained) > 0
    key = lambda d: set(map(tuple, d[['subj', 'pred', 'obj']]
                            .itertuples(index=False)))
    linked_base = {t for t in key(base) if not t[0].startswith('NE_')}
    linked_trained = {t for t in key(trained) if not t[0].startswith('NE_')}
    assert linked_base == linked_trained


def test_crossbi_matcher_trains_both_encoders(ray_session):
    import pandas as pd
    import ray

    from caligraph_ray.functions.train_transformer import TrainedCrossScorer
    from caligraph_ray.pipelines.matcher import TrainedCrossBiMatcher
    from caligraph_ray.pipelines.registry import make_trainable_matcher

    train, val = _synonym_split()

    def corpus_of(pairs, base_uid):
        return ray.data.from_pandas(pd.DataFrame({
            'mention_uid': np.arange(base_uid, base_uid + len(pairs)),
            'label': [m for m, _ in pairs],
            'gold': [e for _, e in pairs]}))

    train_ds = corpus_of(train, 0).materialize()
    val_ds = corpus_of(val, 1000).materialize()
    ents = sorted({e for _, e in train} | {e for _, e in val})

    m = make_trainable_matcher('scored-trained-ce', entity_labels=ents,
                               epochs=12, ce_epochs=12, batch_size=16)
    assert isinstance(m, TrainedCrossBiMatcher)
    m.train(train_ds)
    assert isinstance(m.reranker_factory(), TrainedCrossScorer)
    assert m.ce_loss_history[-1] < m.ce_loss_history[0] * 0.5
    assert m.loss_history[-1] < m.loss_history[0] * 0.5
    f1 = m._evaluate(m.MODE_EVAL, val_ds)['metrics']['f1']
    assert f1 > 0.3, f1

    again = make_trainable_matcher('scored-trained-ce', entity_labels=ents,
                                   epochs=12, ce_epochs=12, batch_size=16)
    again.train(train_ds)
    assert again.threshold == m.threshold
    assert again.predict(again.MODE_EVAL, val_ds) == \
        m.predict(m.MODE_EVAL, val_ds)


def test_weight_persistence_round_trip(tmp_path):
    from caligraph_ray.functions.train_transformer import (load_weights,
                                                           save_weights,
                                                           train_biencoder)

    model = TinyTransformer(dim=16, n_heads=2, n_layers=2, ffn=32,
                            vocab=256, max_len=8, seed=5)
    train_biencoder(model, [('a b', 'c d'), ('e f', 'g h'),
                            ('i j', 'k l')], epochs=1, batch_size=3)
    head = np.random.RandomState(0).randn(16, 2)
    p = str(tmp_path / 'model.npz')
    save_weights(model, p, head=head)
    rt, rt_head = load_weights(p)
    assert np.array_equal(rt.tok_emb, model.tok_emb)
    assert all(np.array_equal(a[k], b[k])
               for a, b in zip(rt.layers, model.layers) for k in a)
    assert np.array_equal(rt_head, head)
    texts = ['a b c', 'k l']
    assert np.array_equal(rt.encode_batch(texts), model.encode_batch(texts))
