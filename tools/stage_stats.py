"""Per-operator wall-time introspection for the flagship pipeline.

Runs the flagship over a testdata dir (default sf0.001) and prints each
phase's wall time plus Ray's own per-operator `ds.stats()` breakdown for
the heaviest datasets — the feedback loop for "iterate until wall-time is
dominated by useful compute".

Usage: python tools/stage_stats.py [sf_dir] [num_cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 4)
    import ray
    ray.init(address='local', num_cpus=ncpu, include_dashboard=False,
             logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd
    from caligraph_ray.pipelines.flagship import (_assemble_triples,
                                                  documents_to_pages)
    from caligraph_ray.stages.alias import (build_alias_index_local,
                                            entity_names_from_index,
                                            explode_mentions, link_mentions)
    from caligraph_ray.stages.html_extract import cats_view, items_view, parse_pages
    from caligraph_ray.stages.triples import materialize_triples

    docs = rd.read_parquet(f'{sf_dir}/documents.parquet',
                           columns=['doc_id', 'text', 'lang', 'source'])
    pages = documents_to_pages(docs)
    phases = {}

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 3)
        return out

    parsed = phase('parse', lambda: parse_pages(pages).materialize())
    items = items_view(parsed)
    cats = cats_view(parsed)
    mentions = phase('explode', lambda: explode_mentions(items).materialize())
    index = phase('alias_index', lambda: build_alias_index_local(mentions))
    linked = phase('link', lambda: link_mentions(mentions, ray.put(index)).materialize())
    triples = phase('assemble', lambda: _assemble_triples(
        linked, cats, 0.95, 0.8, 0.75,
        ent_names=entity_names_from_index(index),
        total_rows=mentions.count()))
    final = phase('sink', lambda: materialize_triples(triples).materialize())

    print(f'== phases (sf={sf_dir}, num_cpus={ncpu}) ==')
    for k, v in phases.items():
        print(f'{k:>12}: {v:8.3f} s')
    print(f'{"triples":>12}: {final.count()} rows')
    for name, ds in [('parsed', parsed), ('mentions', mentions),
                     ('linked', linked), ('triples', final)]:
        print(f'\n== ds.stats(): {name} ==')
        print(ds.stats())
    ray.shutdown()


if __name__ == '__main__':
    main()
