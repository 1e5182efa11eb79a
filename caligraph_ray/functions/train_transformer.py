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

from typing import Dict, List, Sequence, Tuple

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
