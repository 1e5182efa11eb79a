"""Numpy SGD(Adam) fine-tuning of TinyTransformer — the honest analogue of
the reference's model training lifecycle (HF Trainer fine-tune,
mention_detection/__init__.py:17-49; bi-encoder fit, biencoder.py:15-112)
in an environment without torch.

``train_biencoder`` optimizes the SAME weight arrays the inference class
uses (tok_emb + every attention/FFN/layer-norm parameter — end-to-end, not
a head) with an in-batch-negative InfoNCE objective over
(mention-in-context, gold entity) pairs — the wikilink distant supervision
the reference trains on. The forward here mirrors
TinyTransformer.forward op-for-op through functions/autodiff; after
training the weights are written back in place, so the trained model drops
into TransformerEmbedder / link_mentions_scored unchanged (the
constructor-swap seam, stages/ed.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import autodiff as ad
from .tiny_transformer import TinyTransformer, _token_ids

_LN_KEYS = ('g1', 'b1', 'g2', 'b2')
_MAT_KEYS = ('wq', 'wk', 'wv', 'wo', 'w1', 'w2')


def _params_of(model: TinyTransformer):
    ps: Dict[str, ad.Var] = {'tok_emb': ad.param(model.tok_emb.copy())}
    layers = []
    for li, L in enumerate(model.layers):
        lv = {k: ad.param(np.asarray(L[k], dtype=np.float64).copy())
              for k in _MAT_KEYS + _LN_KEYS}
        layers.append(lv)
        for k, v in lv.items():
            ps[f'l{li}.{k}'] = v
    return ps, layers


def _write_back(model: TinyTransformer, ps: Dict[str, ad.Var], layers):
    model.tok_emb = ps['tok_emb'].v
    for L, lv in zip(model.layers, layers):
        for k in _MAT_KEYS + _LN_KEYS:
            L[k] = lv[k].v


def _encode(model: TinyTransformer, ps, layers, texts: Sequence[str]):
    """Autodiff twin of TinyTransformer.encode_batch (same tokenizer,
    padding, attention masking, pooling, normalization)."""
    seqs = [_token_ids(t, model.vocab) or [1] for t in texts]
    ids, mask = model._pad(seqs)
    b, t = ids.shape
    h, dh = model.n_heads, model.dim // model.n_heads
    x = ad.add_const(ad.gather_rows(ps['tok_emb'], ids), model.pos[:t])
    neg = (1.0 - mask)[:, None, None, :] * -1e9
    for lv in layers:
        def heads(m):
            return ad.transpose(ad.reshape(m, (b, t, h, dh)), (0, 2, 1, 3))
        q = heads(ad.matmul(x, lv['wq']))
        k = heads(ad.matmul(x, lv['wk']))
        v = heads(ad.matmul(x, lv['wv']))
        att = ad.softmax_last(ad.add_const(
            ad.scale(ad.matmul(q, ad.transpose(k, (0, 1, 3, 2))),
                     1.0 / np.sqrt(dh)), neg))
        ctx = ad.reshape(ad.transpose(ad.matmul(att, v), (0, 2, 1, 3)),
                         (b, t, model.dim))
        x = ad.layer_norm(ad.add(x, ad.matmul(ctx, lv['wo'])),
                          lv['g1'], lv['b1'])
        x = ad.layer_norm(
            ad.add(x, ad.matmul(ad.gelu(ad.matmul(x, lv['w1'])), lv['w2'])),
            lv['g2'], lv['b2'])
    return ad.l2_normalize(ad.masked_mean_pool(x, mask))


def info_nce(za: ad.Var, zb: ad.Var, tau: float = 0.1) -> ad.Var:
    """Symmetric in-batch-negative InfoNCE: row i's positive is column i."""
    logits = ad.scale(ad.matmul(za, ad.transpose(zb, (1, 0))), 1.0 / tau)
    targets = np.arange(za.v.shape[0])
    la = ad.cross_entropy_rows(logits, targets)
    lb = ad.cross_entropy_rows(ad.transpose(logits, (1, 0)), targets)
    return ad.scale(ad.add(la, lb), 0.5)


def train_biencoder(model: TinyTransformer,
                    pairs: Sequence[Tuple[str, str]],
                    epochs: int = 8, batch_size: int = 32,
                    lr: float = 3e-3, tau: float = 0.1,
                    seed: int = 13) -> List[float]:
    """Adam fine-tune of ``model`` IN PLACE on (text_a, text_b) positive
    pairs with in-batch negatives. Deterministic for a fixed seed. Returns
    the per-epoch mean loss history."""
    ps, layers = _params_of(model)
    names = list(ps)
    m = {n: np.zeros_like(ps[n].v) for n in names}
    v = {n: np.zeros_like(ps[n].v) for n in names}
    b1, b2, eps = 0.9, 0.999, 1e-8
    rng = np.random.RandomState(seed)
    pairs = list(pairs)
    history: List[float] = []
    step = 0
    for _ in range(epochs):
        order = rng.permutation(len(pairs))
        losses = []
        for s in range(0, len(pairs), batch_size):
            idx = order[s:s + batch_size]
            if len(idx) < 2:
                continue   # in-batch negatives need >= 2 rows
            batch = [pairs[i] for i in idx]
            za = _encode(model, ps, layers, [a for a, _ in batch])
            zb = _encode(model, ps, layers, [b for _, b in batch])
            loss = info_nce(za, zb, tau)
            ad.backward(loss)
            step += 1
            corr = np.sqrt(1 - b2 ** step) / (1 - b1 ** step)
            for n in names:
                g = ps[n].g
                if g is None:
                    continue
                m[n] = b1 * m[n] + (1 - b1) * g
                v[n] = b2 * v[n] + (1 - b2) * g * g
                ps[n].v -= lr * corr * m[n] / (np.sqrt(v[n]) + eps)
            losses.append(float(loss.v))
        history.append(float(np.mean(losses)) if losses else float('nan'))
    _write_back(model, ps, layers)
    return history


def recall_at_k(model: TinyTransformer, queries: Sequence[str],
                golds: Sequence[str], entities: Sequence[str],
                k: int = 4) -> float:
    """Fraction of queries whose gold entity lands in the cosine top-k of
    the model's embeddings — the candidate-recall metric the scored ED
    stack's final F1 is bounded by."""
    ents = list(entities)
    emat = model.encode_batch(ents)
    q = model.encode_batch(list(queries))
    sims = q @ emat.T
    hits = 0
    for i, g in enumerate(golds):
        top = np.argsort(-sims[i], kind='stable')[:k]
        if g in {ents[j] for j in top}:
            hits += 1
    return hits / max(len(golds), 1)


# --- token classification (mention-detection lifecycle, ST3) ----------------

def _ids_for_tokens(tokens: Sequence[str], vocab: int) -> List[int]:
    """Per-token hash ids — the same mapping _token_ids applies to the
    whitespace-split words of a text."""
    from .hashing import stable_hash64
    return [2 + stable_hash64((t or '').lower()) % (vocab - 2)
            for t in tokens]


def _encode_tokens(model: TinyTransformer, ps, layers,
                   token_seqs: Sequence[Sequence[str]]):
    """Autodiff twin of the transformer trunk WITHOUT pooling: returns the
    (B, T, D) per-token states plus the pad mask — the
    token-classification forward (reference MD model: roberta token
    classifier, mention_detection/model.py:13-57). The head reads the
    final hidden state PLUS an embedding skip (x_t + tok_emb[id_t]): the
    seeded trunk adds unit-scale sinusoidal positions to 0.05-scale token
    embeddings and layer-norms twice per block, which washes token
    identity out of the linear readout (61% head-only separability
    measured); the skip restores identity and its gradient path while the
    trunk still trains end-to-end through both branches."""
    seqs = [_ids_for_tokens(t, model.vocab) or [1] for t in token_seqs]
    ids, mask = model._pad(seqs)
    b, t = ids.shape
    h, dh = model.n_heads, model.dim // model.n_heads
    x = ad.add_const(ad.gather_rows(ps['tok_emb'], ids), model.pos[:t])
    neg = (1.0 - mask)[:, None, None, :] * -1e9
    for lv in layers:
        def heads(m):
            return ad.transpose(ad.reshape(m, (b, t, h, dh)), (0, 2, 1, 3))
        q = heads(ad.matmul(x, lv['wq']))
        k = heads(ad.matmul(x, lv['wk']))
        v = heads(ad.matmul(x, lv['wv']))
        att = ad.softmax_last(ad.add_const(
            ad.scale(ad.matmul(q, ad.transpose(k, (0, 1, 3, 2))),
                     1.0 / np.sqrt(dh)), neg))
        ctx = ad.reshape(ad.transpose(ad.matmul(att, v), (0, 2, 1, 3)),
                         (b, t, model.dim))
        x = ad.layer_norm(ad.add(x, ad.matmul(ctx, lv['wo'])),
                          lv['g1'], lv['b1'])
        x = ad.layer_norm(
            ad.add(x, ad.matmul(ad.gelu(ad.matmul(x, lv['w1'])), lv['w2'])),
            lv['g2'], lv['b2'])
    x = ad.add(x, ad.gather_rows(ps['tok_emb'], ids))   # embedding skip
    return x, mask


class TokenClassifier:
    """Trained mention-detection head: transformer trunk + (D, 2) readout.
    ``predict_batch(token_lists)`` → 0/1 subject-token tags per position —
    the inference object a map_batches actor holds (model state in
    __init__, batched forward per call), mirroring the reference's MD
    inference (mention_detection/__init__.py:90-101)."""

    def __init__(self, model: TinyTransformer, head: np.ndarray):
        self.model, self.head = model, head

    def predict_batch(self, token_seqs: Sequence[Sequence[str]]):
        seqs = [_ids_for_tokens(t, self.model.vocab) or [1]
                for t in token_seqs]
        ids, mask = self.model._pad(seqs)
        x = self.model.forward(ids, mask) + self.model.tok_emb[ids]
        logits = x @ self.head
        pred = (logits[:, :, 1] > logits[:, :, 0]).astype(np.int64)
        return [list(pred[i, :int(mask[i].sum())]) for i in range(len(seqs))]


def train_token_classifier(model: TinyTransformer,
                           chunks: Sequence[Tuple[Sequence[str], Sequence[int]]],
                           epochs: int = 8, batch_size: int = 16,
                           lr: float = 3e-3, seed: int = 13):
    """Fine-tune trunk + fresh head END-TO-END on (tokens, labels) chunks
    with masked token cross-entropy — the numpy analogue of the
    reference's two-stage MD fine-tune (HF Trainer,
    mention_detection/__init__.py:17-49). Labels: 1 = subject token,
    0 = other, negative (IGNORE/NO_ENTITY sentinels) = masked out.
    Returns (TokenClassifier, per-epoch loss history); deterministic for a
    fixed seed."""
    ps, layers = _params_of(model)
    rng0 = np.random.RandomState(seed + 1)
    head = ad.param(rng0.randn(model.dim, 2) / np.sqrt(model.dim))
    ps['head'] = head
    names = list(ps)
    m = {n: np.zeros_like(ps[n].v) for n in names}
    v = {n: np.zeros_like(ps[n].v) for n in names}
    b1, b2, eps = 0.9, 0.999, 1e-8
    rng = np.random.RandomState(seed)
    chunks = [(list(t), list(l)) for t, l in chunks if len(t)]
    history: List[float] = []
    step = 0
    for _ in range(epochs):
        order = rng.permutation(len(chunks))
        losses = []
        for s in range(0, len(chunks), batch_size):
            idx = order[s:s + batch_size]
            if not len(idx):
                continue
            batch = [chunks[i] for i in idx]
            toks = [t for t, _ in batch]
            x, mask = _encode_tokens(model, ps, layers, toks)
            t_max = mask.shape[1]
            tgt = np.zeros(mask.shape, dtype=np.int64)
            val = np.zeros(mask.shape, dtype=np.float64)
            for bi, (_, labels) in enumerate(batch):
                for ti, lab in enumerate(labels[:t_max]):
                    if lab >= 0:
                        tgt[bi, ti] = 1 if lab > 0 else 0
                        val[bi, ti] = 1.0
            val *= mask
            if not val.any():
                continue
            logits = ad.matmul(x, head)
            loss = ad.cross_entropy_tokens(logits, tgt, val)
            ad.backward(loss)
            step += 1
            corr = np.sqrt(1 - b2 ** step) / (1 - b1 ** step)
            for n in names:
                g = ps[n].g
                if g is None:
                    continue
                m[n] = b1 * m[n] + (1 - b1) * g
                v[n] = b2 * v[n] + (1 - b2) * g * g
                ps[n].v -= lr * corr * m[n] / (np.sqrt(v[n]) + eps)
            losses.append(float(loss.v))
        history.append(float(np.mean(losses)) if losses else float('nan'))
    _write_back(model, ps, layers)
    return TokenClassifier(model, head.v.copy()), history


def snapshot_weights(model: TinyTransformer) -> dict:
    """Plain-array state dict of a (trained) TinyTransformer — the object
    to ``ray.put`` so every inference actor rebuilds the model once."""
    return {'dim': model.dim, 'n_heads': model.n_heads,
            'vocab': model.vocab, 'max_len': model.max_len,
            'tok_emb': model.tok_emb.copy(),
            'layers': [{k: np.asarray(v).copy() for k, v in L.items()}
                       for L in model.layers]}


def restore_weights(state: Optional[dict]) -> TinyTransformer:
    """Rebuild a TinyTransformer from ``snapshot_weights`` output (None →
    the default seeded model, the untrained seam)."""
    if state is None:
        return TinyTransformer(dim=32, seed=13)
    ffn = state['layers'][0]['w1'].shape[1]
    model = TinyTransformer(dim=state['dim'], n_heads=state['n_heads'],
                            n_layers=len(state['layers']), ffn=ffn,
                            vocab=state['vocab'],
                            max_len=state['max_len'])
    model.tok_emb = state['tok_emb']
    model.layers = [dict(L) for L in state['layers']]
    return model


# --- cross-encoder training (rerank lifecycle, ST7) --------------------------

def _pair_masks(m_lens, seqs, t: int):
    """(B,T) masks for the mention side (before [SEP]) and the entity side
    (after it), under _pad truncation."""
    b = len(seqs)
    mask_m = np.zeros((b, t))
    mask_e = np.zeros((b, t))
    for i, (lm, s) in enumerate(zip(m_lens, seqs)):
        lm_c = min(lm, t)
        mask_m[i, :lm_c] = 1.0
        le_end = min(len(s), t)
        if lm + 1 < le_end:
            mask_e[i, lm + 1:le_end] = 1.0
    return mask_m, mask_e


def _encode_pairs(model: TinyTransformer, ps, layers,
                  pairs: Sequence[Tuple[str, str]],
                  skip_scale: float = 8.0):
    """Autodiff twin of TransformerCrossScorer's TRUE cross-encoding
    forward — mention and entity tokens in ONE sequence separated by
    [SEP], attention across both — with an INTERACTION readout: each
    side's contextualized states (plus the embedding skip, same rationale
    as _encode_tokens) mean-pool separately and the head reads their
    elementwise product. A readout of the joint pooled SUM is additively
    decomposable (score = w·pool_m + w·pool_e) and provably cannot
    represent pair MATCHING; the product features can, while training
    still flows end-to-end through the cross-attending trunk.
    ``skip_scale`` amplifies the embedding branch: the LN-normalized trunk
    output is near-constant for equal-length inputs, so the discriminative
    embedding term in the PRODUCT is second-order tiny at scale 1
    (measured: loss pinned at ln 2 for 20+ epochs; ×8 converges in a few
    epochs)."""
    seqs = []
    m_lens = []
    for m, e in pairs:
        im = _token_ids(m, model.vocab)
        s = im + [1] + _token_ids(e, model.vocab)
        seqs.append(s or [1])
        m_lens.append(len(im))
    ids, mask = model._pad(seqs)
    b, t = ids.shape
    h, dh = model.n_heads, model.dim // model.n_heads
    x = ad.add_const(ad.gather_rows(ps['tok_emb'], ids), model.pos[:t])
    neg = (1.0 - mask)[:, None, None, :] * -1e9
    for lv in layers:
        def heads(m_):
            return ad.transpose(ad.reshape(m_, (b, t, h, dh)), (0, 2, 1, 3))
        q = heads(ad.matmul(x, lv['wq']))
        k = heads(ad.matmul(x, lv['wk']))
        v = heads(ad.matmul(x, lv['wv']))
        att = ad.softmax_last(ad.add_const(
            ad.scale(ad.matmul(q, ad.transpose(k, (0, 1, 3, 2))),
                     1.0 / np.sqrt(dh)), neg))
        ctx = ad.reshape(ad.transpose(ad.matmul(att, v), (0, 2, 1, 3)),
                         (b, t, model.dim))
        x = ad.layer_norm(ad.add(x, ad.matmul(ctx, lv['wo'])),
                          lv['g1'], lv['b1'])
        x = ad.layer_norm(
            ad.add(x, ad.matmul(ad.gelu(ad.matmul(x, lv['w1'])), lv['w2'])),
            lv['g2'], lv['b2'])
    x = ad.add(x, ad.scale(ad.gather_rows(ps['tok_emb'], ids),
                           skip_scale))   # amplified embedding skip
    mask_m, mask_e = _pair_masks(m_lens, seqs, ids.shape[1])
    return ad.mul(ad.masked_mean_pool(x, mask_m),
                  ad.masked_mean_pool(x, mask_e))


class TrainedCrossScorer:
    """Trained pair scorer behind the ST7 reranker seam (the reference
    fine-tunes distilbert pair classification, crossencoder.py:81-104):
    ``score_pair(m, e)`` = P(match) from the trained 2-class readout over
    the cross-encoded pool."""

    def __init__(self, model: TinyTransformer, head: np.ndarray,
                 skip_scale: float = 8.0):
        self.model, self.head, self.skip_scale = model, head, skip_scale

    def score_batch(self, mentions: Sequence[str],
                    entities: Sequence[str]) -> np.ndarray:
        seqs, m_lens = [], []
        for m, e in zip(mentions, entities):
            im = _token_ids(m or '', self.model.vocab)
            s = im + [1] + _token_ids(e or '', self.model.vocab)
            seqs.append(s or [1])
            m_lens.append(len(im))
        ids, mask = self.model._pad(seqs)
        x = self.model.forward(ids, mask) \
            + self.skip_scale * self.model.tok_emb[ids]
        mask_m, mask_e = _pair_masks(m_lens, seqs, ids.shape[1])

        def pool(mk):
            return (x * mk[:, :, None]).sum(1) / \
                np.maximum(mk.sum(1, keepdims=True), 1.0)

        logits = (pool(mask_m) * pool(mask_e)) @ self.head
        z = logits - logits.max(-1, keepdims=True)
        e_ = np.exp(z)
        p = e_[:, 1] / e_.sum(-1)
        return np.round(p, 6)

    def score_pair(self, mention_label: str, entity_label: str) -> float:
        return float(self.score_batch([mention_label], [entity_label])[0])


def train_crossencoder(model: TinyTransformer,
                       triples: Sequence[Tuple[str, str, int]],
                       epochs: int = 8, batch_size: int = 32,
                       lr: float = 3e-3, seed: int = 13):
    """Fine-tune trunk + fresh 2-class head END-TO-END on
    (mention, entity, label∈{0,1}) pairs with cross-entropy — the numpy
    analogue of the reference's cross-encoder fine-tune. Returns
    (TrainedCrossScorer, per-epoch loss history); deterministic."""
    ps, layers = _params_of(model)
    rng0 = np.random.RandomState(seed + 2)
    head = ad.param(rng0.randn(model.dim, 2) / np.sqrt(model.dim))
    ps['head'] = head
    names = list(ps)
    m = {n: np.zeros_like(ps[n].v) for n in names}
    v = {n: np.zeros_like(ps[n].v) for n in names}
    b1, b2, eps = 0.9, 0.999, 1e-8
    rng = np.random.RandomState(seed)
    triples = list(triples)
    history: List[float] = []
    step = 0
    for _ in range(epochs):
        order = rng.permutation(len(triples))
        losses = []
        for s in range(0, len(triples), batch_size):
            idx = order[s:s + batch_size]
            if not len(idx):
                continue
            batch = [triples[i] for i in idx]
            pooled = _encode_pairs(model, ps, layers,
                                   [(a, b_) for a, b_, _ in batch])
            logits = ad.matmul(pooled, head)
            targets = np.array([int(l) for _, _, l in batch])
            loss = ad.cross_entropy_rows(logits, targets)
            ad.backward(loss)
            step += 1
            corr = np.sqrt(1 - b2 ** step) / (1 - b1 ** step)
            for n in names:
                g = ps[n].g
                if g is None:
                    continue
                m[n] = b1 * m[n] + (1 - b1) * g
                v[n] = b2 * v[n] + (1 - b2) * g * g
                ps[n].v -= lr * corr * m[n] / (np.sqrt(v[n]) + eps)
            losses.append(float(loss.v))
        history.append(float(np.mean(losses)) if losses else float('nan'))
    _write_back(model, ps, layers)
    return TrainedCrossScorer(model, head.v.copy()), history


def save_weights(model: TinyTransformer, path: str,
                 head: Optional[np.ndarray] = None) -> None:
    """Persist a trained model (and optional task head) as one .npz —
    the stage-cache analogue of the reference's trained-model caches
    (config.yaml model registry): train once, reload in later runs."""
    state = snapshot_weights(model)
    arrays = {'tok_emb': state['tok_emb'],
              'meta': np.array([state['dim'], state['n_heads'],
                                state['vocab'], state['max_len']],
                               dtype=np.int64)}
    for li, L in enumerate(state['layers']):
        for k, v in L.items():
            arrays[f'l{li}.{k}'] = v
    if head is not None:
        arrays['head'] = np.asarray(head)
    np.savez(path, **arrays)


def load_weights(path: str):
    """(TinyTransformer, head-or-None) from ``save_weights`` output."""
    with np.load(path) as z:
        dim, n_heads, vocab, max_len = (int(x) for x in z['meta'])
        layers = []
        li = 0
        while f'l{li}.wq' in z:
            layers.append({k: z[f'l{li}.{k}']
                           for k in _MAT_KEYS + _LN_KEYS})
            li += 1
        state = {'dim': dim, 'n_heads': n_heads, 'vocab': vocab,
                 'max_len': max_len, 'tok_emb': z['tok_emb'],
                 'layers': layers}
        head = z['head'] if 'head' in z else None
        return restore_weights(state), head
