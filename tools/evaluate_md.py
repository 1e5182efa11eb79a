"""CLI: mention-detection evaluation (reference
evaluate_mention_detection.py:5-40 analogue, §2.10 entry-point surface).

Evaluates span predictions against a gold NER jsonl (S6 shape: one object
per line with ``content`` + ``annotation[{points:[{start,end}], label:[L]}]``)
using the SemEval scenario metrics (strict/exact/partial/type —
functions/metrics.ner_span_metrics, mirroring the reference's
evaluation/metrics.py). Without ``--pred`` the deterministic stand-in
predictor runs: every capitalized token run in the text becomes a MISC
span — the model-free baseline the repo's actor interfaces would swap a
transformer into.

Usage:
    python tools/evaluate_md.py --gold gold.jsonl [--pred pred.jsonl]
        [--scenario strict|exact|partial|type] [--num-cpus 8]

Prints one JSON line: {scenario: {precision, recall, f1, ...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CAP_RUN = re.compile(r"(?:\b[A-Z][\w'-]*(?:\s+[A-Z][\w'-]*)*)")


def heuristic_spans(text: str):
    """Deterministic stand-in predictor: capitalized token runs → MISC."""
    return [(m.start(), m.end(), 'MISC') for m in _CAP_RUN.finditer(text)]


def run_md_training(sf_dir: str, limit_docs: int, epochs: int) -> dict:
    """Wikilink-supervised MD training (the reference's two-stage
    fine-tune lifecycle, mention_detection/__init__.py:17-49, honest numpy
    analogue): parse the sf corpus, label each item token 1 iff inside a
    linked mention span, split 80/20 by item, fine-tune the TinyTransformer
    token classifier end-to-end, report val token-P/R/F1 trained vs the
    untrained seam."""
    import numpy as np

    from caligraph_ray.functions.tiny_transformer import TinyTransformer
    from caligraph_ray.functions.train_transformer import (
        TokenClassifier, train_token_classifier)
    from caligraph_ray.pipelines.flagship import documents_to_pages
    from caligraph_ray.stages.html_extract import items_view, parse_pages
    from caligraph_ray.stages.relational import collect_pandas, read_table

    docs = read_table(sf_dir, 'documents',
                      ['doc_id', 'text', 'lang', 'source'])
    if limit_docs:
        docs = docs.limit(limit_docs)
    items = items_view(parse_pages(documents_to_pages(docs)))

    def to_chunks(batch):
        import pandas as pd
        toks_out, labs_out = [], []
        for toks, mentions in zip(batch['tokens'], batch['mentions']):
            toks = list(toks)
            labs = [0] * len(toks)
            for m in mentions:
                if m.get('name'):
                    for t in range(int(m['start']),
                                   min(int(m['end']), len(toks))):
                        labs[t] = 1
            toks_out.append(toks)
            labs_out.append(labs)
        return pd.DataFrame({'tokens': toks_out, 'labels': labs_out})

    # the labeled corpus is an evaluation artifact (matcher-contract
    # precedent): collected for the numpy trainer
    corpus = collect_pandas(items.map_batches(to_chunks,
                                              batch_format='pandas'))
    chunks = [(list(t), list(l))
              for t, l in zip(corpus['tokens'], corpus['labels'])]
    n_train = int(len(chunks) * 0.8)
    train, val = chunks[:n_train], chunks[n_train:]

    def token_f1(clf) -> dict:
        tp = fp = fn = 0
        preds = clf.predict_batch([t for t, _ in val])
        for (_, labs), pred in zip(val, preds):
            for lab, pr in zip(labs, pred):
                tp += int(lab == 1 and pr == 1)
                fp += int(lab == 0 and pr == 1)
                fn += int(lab == 1 and pr == 0)
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        return {'precision': round(p, 6), 'recall': round(r, 6),
                'f1': round(2 * p * r / max(p + r, 1e-12), 6)}

    rng = np.random.RandomState(14)
    untrained = TokenClassifier(TinyTransformer(dim=32, seed=13),
                                rng.randn(32, 2) / np.sqrt(32))
    clf, hist = train_token_classifier(TinyTransformer(dim=32, seed=13),
                                       train, epochs=epochs, seed=13)
    return {'chunks': len(chunks), 'train': n_train, 'val': len(val),
            'loss_first': round(hist[0], 6), 'loss_last': round(hist[-1], 6),
            'val_untrained': token_f1(untrained),
            'val_trained': token_f1(clf)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gold', default=None, help='gold NER jsonl (S6 shape)')
    ap.add_argument('--pred', default=None,
                    help='predictions jsonl (same shape); default: heuristic')
    ap.add_argument('--scenario', default=None,
                    choices=['strict', 'exact', 'partial', 'type'])
    ap.add_argument('--train', action='store_true',
                    help='train the MD token classifier on the wikilink-'
                         'supervised corpus from --sf-dir and report val '
                         'token-F1 trained vs untrained')
    ap.add_argument('--sf-dir', default='/root/testdata/sf0.001')
    ap.add_argument('--limit-docs', type=int, default=200)
    ap.add_argument('--epochs', type=int, default=6)
    ap.add_argument('--num-cpus', type=int, default=8)
    args = ap.parse_args()
    if not args.train and not args.gold:
        ap.error('--gold is required unless --train is given')

    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    if args.train:
        print(json.dumps(run_md_training(args.sf_dir, args.limit_docs,
                                         args.epochs)))
        ray.shutdown()
        return

    from caligraph_ray.functions.metrics import ner_span_metrics
    from caligraph_ray.sources.benchmarks import read_gold_ner_jsonl
    from caligraph_ray.stages.relational import collect_rows

    gold_rows = collect_rows(read_gold_ner_jsonl(args.gold))
    if args.pred:
        pred_rows = collect_rows(read_gold_ner_jsonl(args.pred))
        pred_by_text = {r['text']: [tuple(s) for s in r['entities']]
                        for r in pred_rows}
    else:
        pred_by_text = {r['text']: heuristic_spans(r['text'])
                        for r in gold_rows}

    # micro-aggregate the per-document confusion counts, then P/R/F1
    agg: dict = {}
    for r in gold_rows:
        gold = [tuple(s) for s in r['entities']]
        pred = pred_by_text.get(r['text'], [])
        per_doc = ner_span_metrics(pred, gold)
        for scen, m in per_doc.items():
            a = agg.setdefault(scen, {'correct': 0, 'incorrect': 0,
                                      'partial': 0, 'missed': 0,
                                      'spurious': 0})
            for k in a:
                a[k] += m[k]
    out = {}
    for scen, a in agg.items():
        possible = a['correct'] + a['incorrect'] + a['partial'] + a['missed']
        actual = a['correct'] + a['incorrect'] + a['partial'] + a['spurious']
        num = a['correct'] + (0.5 * a['partial'] if scen == 'partial' else 0)
        p = num / actual if actual else 0.0
        rcl = num / possible if possible else 0.0
        f1 = 2 * p * rcl / (p + rcl) if p + rcl else 0.0
        out[scen] = dict(a, precision=round(p, 6), recall=round(rcl, 6),
                         f1=round(f1, 6))
    if args.scenario:
        out = {args.scenario: out[args.scenario]}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == '__main__':
    main()
