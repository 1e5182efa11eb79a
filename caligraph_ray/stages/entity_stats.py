"""Entity-store statistics + Cali2Ax axiom reuse (reference A8/A9 +
impl/caligraph/cali2ax.py:26-94):

* A9 ``property_frequencies_per_type`` — per-type (pred, value) frequencies
  with the transitive subtype fallback for low-support types
  (impl/caligraph/entity.py:330-352: rolled-up counts are used when a type
  has < 5 direct entities).
* A8 ``tag_probabilities`` / ``valid_tags_for_types`` — P(NER-tag | type)
  over tagged mentions with the parent-tag fallback for tag-less types
  (impl/listing/context.py:134-170, threshold 0.35).
* ``cali2ax_axioms`` — Cat2Ax pattern reuse on OUTPUT types: the category
  patterns are mined once (cat2ax phases 1-2) and applied to each output
  type's label with the type's own property frequencies.

Execution split: all counting is distributed (shuffle_join on entity +
two-phase counts); only the per-TYPE dicts — a |types|-sized dim — reach
the driver for the bottom-up hierarchy fallback passes.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Dict, Optional, Set, Tuple

import pandas as pd

from ..config import CAT2AX_PATTERN_CONF

TAG_PROBABILITY_THRESHOLD = 0.35   # reference config.yaml listing.valid_tag_threshold


def property_frequencies_per_type(types_ds, props_ds, hierarchy=None,
                                  min_support: int = 5,
                                  entity_col: str = 'entity',
                                  type_col: str = 'type') -> Dict[str, Dict[Tuple[str, str], float]]:
    """types (entity, type) × props (entity, pred, value) →
    {type: {(pred, value): freq}} with transitive fallback (A9).

    Counting runs distributed; the bottom-up rollup runs driver-side over
    the |types| dim: a type with < min_support direct entities uses its
    descendants' rolled-up counts (reference entity.py:335-352)."""
    from .relational import collect_rows, shuffle_join, two_phase_count

    ec_rows = collect_rows(two_phase_count(types_ds, [type_col], 'n'))
    ent_count = {r[type_col]: int(r['n']) for r in ec_rows}

    joined = shuffle_join(types_ds, props_ds, entity_col, entity_col, how='inner')
    pc_rows = collect_rows(two_phase_count(joined, [type_col, 'pred', 'value'], 'n'))
    prop_counts: Dict[str, Counter] = defaultdict(Counter)
    for r in pc_rows:
        prop_counts[r[type_col]][(r['pred'], r['value'])] = int(r['n'])

    trans_ec: Dict[str, int] = {}
    trans_pc: Dict[str, Counter] = {}
    if hierarchy is not None:
        from .taxonomy import ROOT
        order = [n for n in hierarchy._topo_order() if n != ROOT]
        for node in reversed(order):          # bottom-up
            trans_ec[node] = ent_count.get(node, 0)
            trans_pc[node] = prop_counts.get(node, Counter()).copy()
            if ent_count.get(node, 0) < min_support:  # reference entity.py:343
                # reference parity (entity.py:343-346), quirks included: a
                # child ABOVE min_support contributes only its direct
                # counts (its own rollup is frozen), and in a DAG a shared
                # descendant is summed once per parent path (double count)
                for c in hierarchy.children(node):
                    trans_ec[node] = trans_ec[node] + trans_ec.get(c, 0)
                    trans_pc[node] = trans_pc[node] + trans_pc.get(c, Counter())

    out: Dict[str, Dict[Tuple[str, str], float]] = {}
    all_types = set(ent_count) | set(trans_ec)
    for t in all_types:
        n = ent_count.get(t, 0)
        counts = prop_counts.get(t, Counter())
        if n < min_support and hierarchy is not None:
            n = trans_ec.get(t, n)
            counts = trans_pc.get(t, counts)
        if n <= 0:
            continue
        out[t] = {pv: c / n for pv, c in counts.items()}
    return out


def tag_probabilities(tagged_mentions_ds, types_ds,
                      entity_col: str = 'entity', tag_col: str = 'tag',
                      type_col: str = 'type') -> Dict[str, Dict[str, float]]:
    """P(tag | type) over tagged mentions (A8, context.py:148-161):
    per-entity tag counts join the entity→type table; probability =
    type's tag occurrences / type's total mention count."""
    from .relational import (collect_rows, shuffle_join, two_phase_count,
                             two_phase_sum)
    per_ent = two_phase_count(tagged_mentions_ds.select_columns([entity_col, tag_col]),
                              [entity_col, tag_col], 'n')
    joined = shuffle_join(per_ent, types_ds, entity_col, entity_col, how='inner')
    # sum of per-entity tag counts (mention multiplicity preserved)
    sums = collect_rows(two_phase_sum(joined, [type_col, tag_col], 'n', alias='cnt'))
    tag_counter: Dict[str, Counter] = defaultdict(Counter)
    total: Counter = Counter()
    for r in sums:
        tag_counter[r[type_col]][r[tag_col]] += int(r['cnt'])
        total[r[type_col]] += int(r['cnt'])
    return {t: {tag: c / total[t] for tag, c in tags.items()}
            for t, tags in tag_counter.items()}


def valid_tags_for_types(tag_probas: Dict[str, Dict[str, float]],
                         hierarchy=None,
                         threshold: float = TAG_PROBABILITY_THRESHOLD) -> Dict[str, Set[str]]:
    """Tags with probability ≥ threshold per type; types left tag-less
    inherit their ancestors' tags (context.py:139-170 parent fallback)."""
    valid: Dict[str, Set[str]] = {
        t: {tag for tag, p in probas.items() if p >= threshold}
        for t, probas in tag_probas.items()}
    if hierarchy is not None:
        from .taxonomy import ROOT

        def resolve(t: str, seen: frozenset) -> Set[str]:
            tags = valid.get(t)
            if tags is None:
                # reference parity (context.py:166-167): an ancestor with NO
                # mention data at all contributes nothing — the climb does
                # not continue past it to grandparents
                return set()
            if tags:
                return tags
            out: Set[str] = set()
            for p in hierarchy.parents(t) - {ROOT}:
                if p not in seen:
                    out |= resolve(p, seen | {t})
            valid[t] = out
            return out

        for t in list(valid):
            resolve(t, frozenset())
    return valid


def cali2ax_axioms(categories_ds, membership_ds, facts_ds,
                   type_entities_ds, type_labels: Dict[str, str],
                   hierarchy=None,
                   pattern_conf: float = CAT2AX_PATTERN_CONF):
    """Cali2Ax (cali2ax.py:26-94): mine Cat2Ax patterns from the CATEGORY
    corpus once, then apply the tries to each OUTPUT type's label with that
    type's property frequencies (A9 — transitive fallback included).
    Property axioms only, per the reference. Returns an axioms Dataset
    (type, pred, value, confidence).

    ``type_entities_ds``: (entity, type) rows of the output store;
    ``type_labels``: type → human label (usually identity)."""
    import ray
    import ray.data as rd
    from .cat2ax import (apply_patterns_to_label, build_pattern_tries,
                         build_type_lexicalisations, category_sets,
                         category_statistics, extract_patterns)
    from .relational import collect_rows

    stats = category_statistics(membership_ds, facts_ds)
    lex = build_type_lexicalisations(facts_ds)
    sets_rows = collect_rows(category_sets(categories_ds))
    patterns = extract_patterns(sets_rows, stats, lex)
    tries = build_pattern_tries(patterns)

    # A9 per-type property frequencies over the output store
    def to_props(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch['pred'] != 'rdf:type'
        b = batch[keep]
        return pd.DataFrame({'entity': b['subj'], 'pred': b['pred'],
                             'value': b['obj']})

    props = facts_ds.map_batches(to_props, batch_format='pandas')
    freqs = property_frequencies_per_type(type_entities_ds, props,
                                          hierarchy=hierarchy)

    rows = []
    for t, label in sorted(type_labels.items()):
        pf = freqs.get(t)
        if not pf:
            continue
        type_stats = {'props': pf, 'types': {}}
        for ax in apply_patterns_to_label(label, tries, type_stats, lex,
                                          pattern_conf):
            if ax['axiom'] != 'prop':
                continue   # Cali2Ax re-extracts property axioms only
            rows.append({'type': t, 'pred': ax['pred'], 'value': ax['value'],
                         'confidence': ax['confidence']})
    if not rows:
        return rd.from_pandas(pd.DataFrame(
            {'type': pd.Series(dtype='object'), 'pred': pd.Series(dtype='object'),
             'value': pd.Series(dtype='object'),
             'confidence': pd.Series(dtype='float64'),
             'is_literal': pd.Series(dtype='bool')}))

    # mined values inherit the literal flag of the facts they came from (a
    # birth-year axiom must materialize as a literal triple, exactly as the
    # fact table states it)
    from .cat2ax import literal_flags_for_pairs
    lit_map = literal_flags_for_pairs(
        facts_ds, {(r['pred'], r['value']) for r in rows})
    for r in rows:
        r['is_literal'] = lit_map.get((r['pred'], r['value']), False)
    return rd.from_pandas(pd.DataFrame(rows))


def cali2ax_triples(axioms_ds, type_entities_ds,
                    entity_col: str = 'entity', type_col: str = 'type'):
    """Materialize Cali2Ax axioms onto every entity of the axiom'd type
    (entity.py:134-153 add_axiom_information), distributed via broadcast
    axioms (the axiom dim is |types|-sized)."""
    import pyarrow as pa
    import ray
    from .relational import collect_rows
    from .triples import TRIPLES_SCHEMA
    ax_rows = collect_rows(axioms_ds)
    by_type: Dict[str, list] = defaultdict(list)
    for a in ax_rows:
        by_type[a['type']].append((a['pred'], a['value'],
                                   bool(a.get('is_literal', False))))
    ref = ray.put(dict(by_type))

    def emit(batch: pd.DataFrame) -> pa.Table:
        from ..state.broadcast import get_broadcast
        axioms = get_broadcast(ref)
        subj, pred, obj, lit = [], [], [], []
        for ent, t in zip(batch[entity_col], batch[type_col]):
            for (p, v, is_lit) in axioms.get(t, ()):
                subj.append(ent)
                pred.append(p)
                obj.append(v)
                lit.append(is_lit)
        return pa.Table.from_pydict({'subj': subj, 'pred': pred, 'obj': obj,
                                     'is_literal': lit},
                                    schema=TRIPLES_SCHEMA)

    return type_entities_ds.map_batches(emit, batch_format='pandas')
