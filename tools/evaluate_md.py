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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gold', required=True, help='gold NER jsonl (S6 shape)')
    ap.add_argument('--pred', default=None,
                    help='predictions jsonl (same shape); default: heuristic')
    ap.add_argument('--scenario', default=None,
                    choices=['strict', 'exact', 'partial', 'type'])
    ap.add_argument('--num-cpus', type=int, default=8)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

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
