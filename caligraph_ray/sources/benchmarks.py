"""Benchmark corpus readers: NILK jsonl (S5, reference
…/entity_disambiguation/data/nilk.py:78-114) and gold-standard NER json
(S6, impl/util/spacy/listing_parser.py:21-32), Ray-Data-first — jsonl is
read distributed (``read_json``) and normalized/filtered per batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Set

import pandas as pd

from ..functions.hashing import stable_hash64

NEW_ENTITY_BASE = 50_000_000   # reference nilk.py:81: unknown-entity id space


def read_nilk_jsonl(path: str, known_page_ids: Optional[Set[int]] = None,
                    wikidata_to_ent: Optional[Dict[str, int]] = None):
    """NILK examples → Dataset (example_id, label, left_text, right_text,
    page_id, ent_id, is_nil).

    Validity filters mirror the reference: an example is dropped when its
    occurrence page is unknown (known_page_ids given) or when it is non-NIL
    but its wikidata id has no known entity mapping (wikidata_to_ent
    given). Unknown-entity ids live past NEW_ENTITY_BASE; the reference
    assigns them sequentially by first-seen order (single-process), we
    assign ``BASE + stable_hash64(wikidata_id) % 10^7`` — order-free, so
    the assignment is deterministic under any distribution."""
    import ray
    import ray.data as rd
    ds = rd.read_json(path)
    # dims travel via the object store + process-local broadcast cache, not
    # the task closure: at the documented ~10^7-id scale a closure-captured
    # dict is re-pickled into every task instead of deserialized once per
    # worker (the same pattern alias/ed/redirects use)
    dims_ref = ray.put((known_page_ids, wikidata_to_ent))

    def normalize(batch: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import get_broadcast
        known_page_ids, wikidata_to_ent = get_broadcast(dims_ref)
        rows = []
        for r in batch.itertuples():
            page_id = int(r.wikipedia_page_id)
            if known_page_ids is not None and page_id not in known_page_ids:
                continue
            wikidata_id = r.wikidata_id
            is_nil = bool(r.nil)
            known = (wikidata_to_ent or {}).get(wikidata_id)
            if not is_nil and wikidata_to_ent is not None and known is None:
                continue
            ent_id = known if known is not None else \
                NEW_ENTITY_BASE + stable_hash64(str(wikidata_id)) % 10_000_000
            start = int(r.offset)
            end = start + int(r.length)
            context = r.context
            rows.append({
                'example_id': r.id,
                'label': r.mention,
                'left_text': context[:start].strip(),
                'right_text': context[end:].strip(),
                'page_id': page_id,
                'ent_id': int(ent_id),
                'is_nil': is_nil,
            })
        cols = ['example_id', 'label', 'left_text', 'right_text', 'page_id',
                'ent_id', 'is_nil']
        return pd.DataFrame(rows, columns=cols)

    return ds.map_batches(normalize, batch_format='pandas')


def read_gold_ner_jsonl(path: str):
    """Gold-standard NER jsonl ({content, annotation: [{points: [{start,
    end}], label: [L]}]}) → Dataset (text, entities: list of [start,
    end+1, label]) — the training-example shape the listing NER model
    consumes (listing_parser.py:21-32; end is inclusive in the file,
    half-open in the output)."""
    import ray.data as rd
    ds = rd.read_json(path)

    def normalize(batch: pd.DataFrame) -> pd.DataFrame:
        texts, ents = [], []
        for r in batch.itertuples():
            spans = []
            for ann in r.annotation:
                point = ann['points'][0]
                spans.append([int(point['start']), int(point['end']) + 1,
                              ann['label'][0]])
            texts.append(r.content)
            ents.append(spans)
        return pd.DataFrame({'text': texts, 'entities': ents})

    return ds.map_batches(normalize, batch_format='pandas')
