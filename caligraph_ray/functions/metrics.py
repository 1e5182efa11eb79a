"""Evaluation harnesses (reference
…/mention_detection/evaluation/metrics.py:12-159 NER scenario metrics and
…/entity_disambiguation/evaluation.py:122-188 ED metrics): pure,
deterministic driver-side functions over prediction/gold structures — the
P/R ≥ 0.95 north-star gate can be graded on any corpus, not just the
synthetic golden.

* NER span metrics — SemEval-2013 style scenarios (strict / exact /
  partial / type) with COR/INC/PAR/MIS/SPU counting.
* ED mention→entity P/R/F1.
* Clustering metrics — B³ P/R/F1, MUC, CEAF-e (exact optimal mapping via a
  built-in Hungarian solver; no scipy in this environment), NMI, ARI.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence, Set, Tuple

import numpy as np

Span = Tuple[int, int, str]   # (start, end, type)


# --- NER span metrics --------------------------------------------------------

def _overlap(a: Span, b: Span) -> bool:
    return a[0] < b[1] and b[0] < a[1]


def ner_span_metrics(pred: Sequence[Span], gold: Sequence[Span]) -> Dict[str, Dict[str, float]]:
    """SemEval-2013 task-9.1 evaluation schema over one document (the
    reference computes the same four scenarios). Returns
    {scenario: {precision, recall, f1, correct, incorrect, partial,
    missed, spurious}} for scenarios strict/exact/partial/type."""
    out = {}
    for scenario in ('strict', 'exact', 'partial', 'type'):
        cor = inc = par = 0
        matched_gold: Set[int] = set()
        matched_pred: Set[int] = set()
        for pi, p in enumerate(pred):
            best = None
            for gi, g in enumerate(gold):
                if gi in matched_gold or not _overlap(p, g):
                    continue
                best = (gi, g)
                break
            if best is None:
                continue
            gi, g = best
            same_bounds = (p[0], p[1]) == (g[0], g[1])
            same_type = p[2] == g[2]
            if scenario == 'strict':
                ok = same_bounds and same_type
                partial_hit = False
            elif scenario == 'exact':
                ok = same_bounds
                partial_hit = False
            elif scenario == 'partial':
                ok = same_bounds
                partial_hit = not same_bounds
            else:   # type: any overlap with matching type
                ok = same_type
                partial_hit = False
            matched_gold.add(gi)
            matched_pred.add(pi)
            if ok:
                cor += 1
            elif partial_hit:
                par += 1
            else:
                inc += 1
        spu = len(pred) - len(matched_pred)
        mis = len(gold) - len(matched_gold)
        possible = cor + inc + par + mis
        actual = cor + inc + par + spu
        num = cor + 0.5 * par
        precision = num / actual if actual else 0.0
        recall = num / possible if possible else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall else 0.0)
        out[scenario] = {'precision': precision, 'recall': recall, 'f1': f1,
                         'correct': cor, 'incorrect': inc, 'partial': par,
                         'missed': mis, 'spurious': spu}
    return out


# --- mention→entity P/R/F1 ---------------------------------------------------

def me_prf(pred: Dict[object, object], gold: Dict[object, object]) -> Dict[str, float]:
    """Mention→entity precision/recall/F1 (evaluation.py ME metrics):
    precision over predicted assignments, recall over gold assignments."""
    tp = sum(1 for m, e in pred.items() if gold.get(m) == e)
    precision = tp / len(pred) if pred else 0.0
    recall = tp / len(gold) if gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {'precision': precision, 'recall': recall, 'f1': f1}


# --- clustering metrics ------------------------------------------------------

def _as_clusters(assignment: Dict[object, object]) -> List[Set[object]]:
    by = defaultdict(set)
    for m, c in assignment.items():
        by[c].add(m)
    return list(by.values())


def b_cubed(pred: Dict[object, object], gold: Dict[object, object]) -> Dict[str, float]:
    """B³ precision/recall/F1 (Bagga & Baldwin 1998)."""
    mentions = set(pred) & set(gold)
    if not mentions:
        return {'precision': 0.0, 'recall': 0.0, 'f1': 0.0}
    pred_by = defaultdict(set)
    gold_by = defaultdict(set)
    for m in mentions:
        pred_by[pred[m]].add(m)
        gold_by[gold[m]].add(m)
    p_sum = r_sum = 0.0
    for m in mentions:
        pc = pred_by[pred[m]]
        gc = gold_by[gold[m]]
        inter = len(pc & gc)
        p_sum += inter / len(pc)
        r_sum += inter / len(gc)
    precision = p_sum / len(mentions)
    recall = r_sum / len(mentions)
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {'precision': precision, 'recall': recall, 'f1': f1}


def muc(pred: Dict[object, object], gold: Dict[object, object]) -> Dict[str, float]:
    """MUC link-based metric (Vilain et al. 1995)."""
    def score(key: List[Set[object]], response: Dict[object, object]):
        num = den = 0
        for cluster in key:
            # partitions of the key cluster by the response assignment
            parts = {response.get(m, ('__missing__', m)) for m in cluster}
            num += len(cluster) - len(parts)
            den += len(cluster) - 1
        return num, den

    r_num, r_den = score(_as_clusters(gold), pred)
    p_num, p_den = score(_as_clusters(pred), gold)
    precision = p_num / p_den if p_den else 0.0
    recall = r_num / r_den if r_den else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {'precision': precision, 'recall': recall, 'f1': f1}


def _hungarian_max(cost: np.ndarray) -> float:
    """Maximum-weight assignment total for a (possibly rectangular) matrix —
    O(n³) Hungarian on the negated, zero-padded square matrix."""
    n = max(cost.shape)
    pad = np.zeros((n, n))
    pad[:cost.shape[0], :cost.shape[1]] = cost
    a = (pad.max() - pad)    # minimize
    INF = float('inf')
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    p = [0] * (n + 1)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = a[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    total = 0.0
    for j in range(1, n + 1):
        if p[j]:
            total += pad[p[j] - 1][j - 1]
    return total


def ceaf_e(pred: Dict[object, object], gold: Dict[object, object]) -> Dict[str, float]:
    """Entity-based CEAF (Luo 2005, φ4 similarity) with the exact optimal
    cluster alignment (built-in Hungarian; no scipy here)."""
    P = _as_clusters(pred)
    G = _as_clusters(gold)
    if not P or not G:
        return {'precision': 0.0, 'recall': 0.0, 'f1': 0.0}
    sim = np.zeros((len(G), len(P)))
    for i, g in enumerate(G):
        for j, p in enumerate(P):
            inter = len(g & p)
            if inter:
                sim[i, j] = 2.0 * inter / (len(g) + len(p))
    total = _hungarian_max(sim)
    precision = total / len(P)
    recall = total / len(G)
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {'precision': precision, 'recall': recall, 'f1': f1}


def _entropy(counts: Iterable[int], n: int) -> float:
    return -sum((c / n) * math.log(c / n) for c in counts if c)


def nmi(pred: Dict[object, object], gold: Dict[object, object]) -> float:
    """Normalized mutual information (arithmetic normalization)."""
    mentions = sorted(set(pred) & set(gold), key=repr)
    n = len(mentions)
    if n == 0:
        return 0.0
    pc = Counter(pred[m] for m in mentions)
    gc = Counter(gold[m] for m in mentions)
    joint = Counter((pred[m], gold[m]) for m in mentions)
    h_p = _entropy(pc.values(), n)
    h_g = _entropy(gc.values(), n)
    mi = 0.0
    for (cp, cg), c in joint.items():
        mi += (c / n) * math.log(n * c / (pc[cp] * gc[cg]))
    denom = (h_p + h_g) / 2
    return mi / denom if denom else 1.0


def ari(pred: Dict[object, object], gold: Dict[object, object]) -> float:
    """Adjusted Rand index (Hubert & Arabie 1985)."""
    mentions = sorted(set(pred) & set(gold), key=repr)
    n = len(mentions)
    if n < 2:
        return 1.0
    joint = Counter((pred[m], gold[m]) for m in mentions)
    pc = Counter(pred[m] for m in mentions)
    gc = Counter(gold[m] for m in mentions)
    comb = lambda x: x * (x - 1) / 2
    sum_ij = sum(comb(c) for c in joint.values())
    sum_p = sum(comb(c) for c in pc.values())
    sum_g = sum(comb(c) for c in gc.values())
    expected = sum_p * sum_g / comb(n)
    max_idx = (sum_p + sum_g) / 2
    if max_idx == expected:
        return 1.0
    return (sum_ij - expected) / (max_idx - expected)


def ed_metrics(pred: Dict[object, object], gold: Dict[object, object]) -> Dict[str, object]:
    """The full ED metric set the reference reports (evaluation.py:122-188):
    ME P/R/F1 + B³ + MUC + CEAF-e + NMI + ARI."""
    return {
        'me': me_prf(pred, gold),
        'b3': b_cubed(pred, gold),
        'muc': muc(pred, gold),
        'ceaf_e': ceaf_e(pred, gold),
        'nmi': nmi(pred, gold),
        'ari': ari(pred, gold),
    }
