"""CLI: Wikipedia XML dump part(s) → KG triples (the reference's
`python .` extraction entry, xml_parser.py → page_parser.py → graph, as
one Ray pipeline over the round-3 ingestion sources).

Usage:
    python tools/ingest_dump.py --dump part1.xml.bz2 [part2.xml.bz2 ...]
        [--out /tmp/kg] [--nt] [--num-cpus 8]

Reads the dump part(s) (plain XML or multistream bz2), parses the wiki
markup front end, links/canonicalizes mentions and writes sorted
partitioned Parquet triples (plus NT lines with --nt). Owns its Ray
session (entry-point contract: library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dump', nargs='+', required=True,
                    help='dump part file(s): .xml or (multistream) .xml.bz2')
    ap.add_argument('--out', default='/tmp/caligraph_kg')
    ap.add_argument('--nt', action='store_true',
                    help='also write N-Triples lines next to the parquet')
    ap.add_argument('--num-cpus', type=int, default=8)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level='ERROR')
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from caligraph_ray.pipelines.flagship import run_flagship
    from caligraph_ray.sources.xml_dump import (dump_to_pages,
                                                read_wiki_xml_dump)

    pages = dump_to_pages(read_wiki_xml_dump(args.dump))
    out_dir = os.path.join(args.out, 'triples')
    triples = run_flagship(pages, out_dir=out_dir, markup='wikitext')
    n = triples.count()
    if args.nt:
        from caligraph_ray.sources.nt import write_nt
        write_nt(triples, os.path.join(args.out, 'nt'))
    print(json.dumps({'triples': int(n), 'out': out_dir,
                      'nt': bool(args.nt)}))
    ray.shutdown()


if __name__ == '__main__':
    main()
