"""Cluster job entrypoint for the LLM-training-data composite (the
data-pipeline twin of tools/run_kg_job.py): documents-table Parquet in →
checkpointed lang-gate → clean (host-quality, exact-dedup, decontaminate)
→ packed-sequence index out, with per-stage lineage records and a metrics
JSON. Resumable: re-submitting the same --root skips every stage whose
``_SUCCESS`` + fingerprint match and re-runs only the remainder.

On a real cluster:

    ray job submit --working-dir . -- \
        python tools/run_dataprep_job.py --input /data/docs --root /data/prep

Locally the same command falls back to a single-node session. Library
code never calls ray.init — only this entrypoint owns the session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True,
                    help='Parquet dir/file of the documents table '
                         '(doc_id, text, source)')
    ap.add_argument('--root', required=True,
                    help='checkpoint + output root (resume target)')
    ap.add_argument('--capacity', type=int, default=512,
                    help='tokens per packed training sequence')
    ap.add_argument('--num-cpus', type=int, default=None,
                    help='local fallback only; ignored under a cluster')
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        try:
            ray.init(address='auto', include_dashboard=False,
                     logging_level='ERROR')
        except Exception:
            ray.init(address='local', include_dashboard=False,
                     logging_level='ERROR',
                     num_cpus=args.num_cpus or os.cpu_count())
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from caligraph_ray.pipelines.data_prep import \
        training_data_prep_checkpointed
    from caligraph_ray.stages.relational import strip_schema_metadata

    t0 = time.time()
    docs = strip_schema_metadata(
        rd.read_parquet(args.input, columns=['doc_id', 'text', 'source']))
    n_docs = docs.count()
    packed = training_data_prep_checkpointed(docs, args.root,
                                             capacity=args.capacity)
    n_rows = packed.count()
    wall = time.time() - t0

    metrics = {
        'input': args.input,
        'root': args.root,
        'capacity': args.capacity,
        'n_docs': int(n_docs),
        'packed_rows': int(n_rows),
        'wall_s': round(wall, 2),
        'docs_per_sec': round(n_docs / wall, 1) if wall else None,
        'cluster_cpus': int(ray.cluster_resources().get('CPU', 0)),
        'finished_ts': time.time(),
    }
    with open(os.path.join(args.root, 'JOB_METRICS.json'), 'w') as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == '__main__':
    main()
