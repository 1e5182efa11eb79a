"""Ontology heuristics + Hearst-pattern hypernym extraction.

References:
* Hearst matcher M17 — impl/util/spacy/hearst_matcher.py:6-65 (spaCy
  matcher); here a deterministic regex engine over plain text with the FULL
  reference pattern inventory (such-as / including / especially /
  particularly / other-than / and-or-other / is-a with every lemma-'be'
  form, hearst_matcher.py:6-36).
* Hypernym counts A1 — impl/wikipedia/nif_parser.py:18-63.
* Domain/range heuristic A10 — impl/dbpedia/heuristics.py:38-62
  (argmax type share ≥ .96 domain / .77 range).
* Type disjointness A11 — impl/dbpedia/heuristics.py:80-160 (cosine of
  type-property weight vectors, threshold 0.132).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import AGG_BATCH_SIZE, DOMAIN_THRESHOLD, RANGE_THRESHOLD
from .relational import collect_pandas, two_phase_count, two_phase_pandas_agg

# --- Hearst patterns --------------------------------------------------------

# NP = up to 3 non-function words (function words break chunks, mirroring
# the reference's noun-chunk boundaries)
_NPW = r"(?!(?:and|or|such|as|including|especially|particularly|other|than|is|are|was|were|be|been|being|am|a|an|the|of|in|to)\b)[A-Za-z][\w'-]*"
_NP = r"((?:" + _NPW + r"\s){0,2}" + _NPW + r")"
# lemma-'be' forms (reference is-a matches {'LEMMA': 'be'} + a/an)
_BE = r"(?:is|are|was|were|be|been|being|am)"
HEARST_PATTERNS: List[Tuple[re.Pattern, str]] = [
    (re.compile(_NP + r"\s+such as\s+" + _NP), 'obj-sub'),        # X such as Y → (Y, X)
    (re.compile(r"such\s+" + _NP + r"\s+as\s+" + _NP), 'obj-sub'),
    (re.compile(_NP + r"\s*,?\s+including\s+" + _NP), 'obj-sub'),
    (re.compile(_NP + r"\s*,?\s+especially\s+" + _NP), 'obj-sub'),
    (re.compile(_NP + r"\s*,?\s+particularly\s+" + _NP), 'obj-sub'),
    (re.compile(_NP + r"\s+other than\s+" + _NP), 'obj-sub'),     # X other than Y → (Y, X)
    (re.compile(_NP + r"\s+(?:and|or)\s+other\s+" + _NP), 'sub-obj'),  # Y and other X
    (re.compile(_NP + r"\s+" + _BE + r"\s+an?\s+" + _NP), 'sub-obj'),  # Y is a X
]


def hearst_matches(text: str) -> List[Tuple[str, str]]:
    """(subject, hypernym) pairs found in text; noun phrases are ≤3-token
    word runs (deterministic stand-in for the spaCy chunker)."""
    out = []
    for rx, order in HEARST_PATTERNS:
        for m in rx.finditer(text):
            a, b = m.group(1).strip(), m.group(2).strip()
            if not a or not b or a.lower() == b.lower():
                continue
            out.append((b, a) if order == 'obj-sub' else (a, b))
    return out


def hypernym_counts(docs_ds, text_col: str = 'text'):
    """(sub, hyper, freq) via per-batch Hearst matching + two-phase count
    (A1: per-pair counts merged across workers)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in batch[text_col]:
            for sub, hyper in hearst_matches(text):
                c[(sub.lower(), hyper.lower())] += 1
        # typed arrays: a zero-match batch must emit string key columns,
        # not the float64/null schema pandas infers for empty frames (which
        # the aggregation exchange cannot unify with string blocks at scale)
        return pa.Table.from_pydict({
            'sub': pa.array([k[0] for k in c], pa.string()),
            'hyper': pa.array([k[1] for k in c], pa.string()),
            'cnt': pa.array(list(c.values()), pa.int64())})

    partials = docs_ds.map_batches(partial, batch_format='pandas',
                                   batch_size=AGG_BATCH_SIZE)
    return two_phase_pandas_agg(partials, ['sub', 'hyper'], {'freq': ('cnt', 'sum')})


# --- hypernymy evidence merge ------------------------------------------------

# per-source evidence thresholds (reference impl/util/hypernymy.py:55-58)
HYPERNYM_THRESHOLD_AXIOM = 10
HYPERNYM_THRESHOLD_WIKI = 100
HYPERNYM_THRESHOLD_WEB = 0.4


def compute_hypernyms(axiom_counts: Dict[str, Dict[str, int]],
                      wiki_counts: Dict[str, Dict[str, int]],
                      web_confs: Dict[str, Dict[str, float]] = None
                      ) -> Dict[str, set]:
    """Merge hypernym evidence from the three sources (reference
    impl/util/hypernymy.py:61-98): axiom matches count double (weight 2
    when count ≥ 10), Wiki-corpus Hearst counts and WebIsALOD-style
    confidences count once (count ≥ 100 / conf ≥ 0.4); a hypernym is kept
    when its merged evidence weight exceeds 1 — i.e. at least axiom
    evidence OR two independent corpus sources.

    Inputs are {child_word: {parent_word: count|conf}} dims — the outputs
    of the distributed ``hypernym_counts`` aggregation (A1) and a Cat2Ax
    axiom-edge count; the merge itself is a per-word dim operation."""
    web_confs = web_confs or {}
    out: Dict[str, set] = {}
    for child in set(axiom_counts) | set(wiki_counts) | set(web_confs):
        weight: Counter = Counter()
        for word, count in axiom_counts.get(child, {}).items():
            if count >= HYPERNYM_THRESHOLD_AXIOM:
                weight[word] += 2
        for word, count in wiki_counts.get(child, {}).items():
            if count >= HYPERNYM_THRESHOLD_WIKI:
                weight[word] += 1
        for word, conf in web_confs.get(child, {}).items():
            if conf >= HYPERNYM_THRESHOLD_WEB:
                weight[word] += 1
        out[child] = {word for word, w in weight.items() if w > 1}
    return out


def is_hypernym(hypernyms: Dict[str, set], parent: str, child: str) -> bool:
    """Reference hypernymy_util.is_hypernym: equal words are trivially
    hypernyms; otherwise look the pair up in the merged evidence."""
    if parent == child:
        return True
    return parent in hypernyms.get(child, ())


# --- domain / range ---------------------------------------------------------

def domain_range(facts_ds, types_by_ent: Dict[str, List[str]],
                 domain_threshold: float = DOMAIN_THRESHOLD,
                 range_threshold: float = RANGE_THRESHOLD) -> pd.DataFrame:
    """Per predicate: argmax subject-type share → domain (≥ .96), argmax
    object-type share → range (≥ .77). types_by_ent is the broadcast type
    dim. Returns (pred, domain|None, range|None)."""
    import ray
    tref = ray.put(types_by_ent)

    _INST = '\x00inst'   # per-instance marker row: the share denominator

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        tbe = ray.get(tref)
        preds, sides, types = [], [], []
        lits = batch['is_literal'] if 'is_literal' in batch.columns \
            else np.zeros(len(batch), dtype=bool)
        for p, s, o, lit in zip(batch['pred'], batch['subj'], batch['obj'], lits):
            if lit:
                continue
            # the share denominator is the number of typed INSTANCES, not
            # the number of type rows: a subject typed [Person, Agent,
            # Thing] is one instance that is 100% Person — dividing by the
            # summed type rows (1/3) would make the .96 threshold
            # unreachable for any multi-typed KB (reference
            # impl/dbpedia/heuristics.py:38-62 argmax over instance share)
            ts = tbe.get(s, ())
            for t in ts:   # subject types → domain evidence
                preds.append(p); sides.append('d'); types.append(t)
            if ts:
                preds.append(p); sides.append('d'); types.append(_INST)
            to = tbe.get(o, ())
            for t in to:
                preds.append(p); sides.append('r'); types.append(t)
            if to:
                preds.append(p); sides.append('r'); types.append(_INST)
        return pa.Table.from_pydict({
            'pred': pa.array(preds, pa.string()),
            'side': pa.array(sides, pa.string()),
            'type': pa.array(types, pa.string())})

    ev = facts_ds.map_batches(explode, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
    counts = collect_pandas(two_phase_count(ev, ['pred', 'side', 'type'], 'cnt'))
    if counts.empty:   # no typed endpoint anywhere: schema-less empty frame
        return pd.DataFrame(columns=['pred', 'domain', 'range'])
    out = []
    for pred, g in counts.groupby('pred'):
        row = {'pred': pred, 'domain': None, 'range': None}
        for side, col, thr in [('d', 'domain', domain_threshold),
                               ('r', 'range', range_threshold)]:
            sg = g[g['side'] == side]
            inst = sg[sg['type'] == _INST]
            sg = sg[sg['type'] != _INST]
            if sg.empty or inst.empty:
                continue
            total = int(inst['cnt'].iloc[0])
            best = sg.sort_values(['cnt', 'type'], ascending=[False, True]).iloc[0]
            if best['cnt'] / total >= thr:
                row[col] = best['type']
        out.append(row)
    return pd.DataFrame(out, columns=['pred', 'domain', 'range'])


# --- type disjointness ------------------------------------------------------

def type_disjointness(facts_ds, types_by_ent: Dict[str, List[str]],
                      threshold: float = 0.132) -> pd.DataFrame:
    """Disjoint type pairs: cosine similarity of per-type predicate-usage
    weight vectors below threshold (A11). Types are a small dim → the
    all-pairs cosine runs driver-side on the aggregated matrix."""
    import ray
    tref = ray.put(types_by_ent)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        tbe = ray.get(tref)
        types, preds = [], []
        for s, p in zip(batch['subj'], batch['pred']):
            for t in tbe.get(s, ()):
                types.append(t); preds.append(p)
        return pd.DataFrame({'type': types, 'pred': preds})

    ev = facts_ds.map_batches(explode, batch_format='pandas', batch_size=AGG_BATCH_SIZE)
    counts = collect_pandas(two_phase_count(ev, ['type', 'pred'], 'cnt'))
    if counts.empty:
        return pd.DataFrame(columns=['type_a', 'type_b', 'cosine'])
    mat = counts.pivot_table(index='type', columns='pred', values='cnt',
                             fill_value=0.0)
    # tf-idf-ish weighting (heuristics.py:128-149): damp ubiquitous predicates
    df_weight = np.log(len(mat) / (mat > 0).sum(axis=0).clip(lower=1))
    weighted = mat * df_weight
    norms = np.linalg.norm(weighted, axis=1)
    normed = weighted.div(np.maximum(norms, 1e-12), axis=0)
    sims = normed @ normed.T
    types = list(mat.index)
    nz = norms > 1e-12
    rows = []
    for i, a in enumerate(types):
        for j in range(i + 1, len(types)):
            # a type whose idf-damped vector is all-zero carries ZERO
            # discriminative evidence — declaring it disjoint from
            # everything (cos 0.0 ≤ threshold) is wrong, and the SQL
            # replay's 0/0 → NULL excludes such pairs; match it
            if not (nz[i] and nz[j]):
                continue
            cos = float(sims.iloc[i, j])
            if cos <= threshold:
                rows.append({'type_a': a, 'type_b': types[j], 'cosine': round(cos, 6)})
    return pd.DataFrame(rows, columns=['type_a', 'type_b', 'cosine'])
