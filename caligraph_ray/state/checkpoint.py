"""Stage checkpointing with per-partition lineage (north-rule requirement).

Analogue of the reference's cache registry (utils.py:66-138,
config.yaml:140-317) re-expressed for a distributed engine: every named
stage writes Parquet to ``<root>/<stage>/`` plus

* ``_LINEAGE.json``  — rows in/out, parse drops, wall time, block count
* ``_SUCCESS``       — atomic completion marker (written last)

``run_stage`` skips a stage whose ``_SUCCESS`` exists and re-reads its
Parquet instead — resume-by-existence, the same contract the reference's
``load_or_create_cache`` provides, but partition-granular: output files are
one-per-block, so a partially-written stage reruns only what's missing
(directory is wiped before rerun to stay atomic).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Dict, Optional

import ray  # noqa: F401  (string annotations resolve against module globals)


def _stage_dir(root: str, name: str) -> str:
    return os.path.join(root, name)


def is_complete(root: str, name: str) -> bool:
    return os.path.exists(os.path.join(_stage_dir(root, name), '_SUCCESS'))


def read_lineage(root: str, name: str) -> Optional[dict]:
    path = os.path.join(_stage_dir(root, name), '_LINEAGE.json')
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def fingerprint_of(params: Dict) -> str:
    """Stable hash of a stage's semantic inputs (thresholds, input row
    counts, code versions…). Stored in _LINEAGE.json; a resume whose
    fingerprint differs invalidates the checkpoint instead of silently
    reusing stale Parquet."""
    import hashlib
    blob = json.dumps(params, sort_keys=True, default=str).encode('utf-8')
    return hashlib.blake2b(blob, digest_size=16).hexdigest()


def run_stage(root: str, name: str, build: Callable[[], 'ray.data.Dataset'],
              extra_lineage: Optional[Dict] = None,
              fingerprint: Optional[Dict] = None):
    """Build-or-load a named stage.

    ``build()`` returns the stage's output Dataset; it is written to the
    stage directory with lineage, then re-read (so downstream stages consume
    the durable copy — a crashed pipeline resumes from the last _SUCCESS).

    ``fingerprint``: dict of the stage's semantic inputs (thresholds, input
    row count/schema, …). On resume the stored fingerprint must match, else
    the stale checkpoint is rebuilt (guards against re-running one root
    against a different corpus or config).
    """
    import ray.data as rd

    fp = fingerprint_of(fingerprint) if fingerprint is not None else None
    d = _stage_dir(root, name)
    if is_complete(root, name):
        if fp is not None:
            lin = read_lineage(root, name) or {}
            if lin.get('fingerprint') != fp:
                shutil.rmtree(d)  # config/input changed: checkpoint is stale
            else:
                return rd.read_parquet(d)
        else:
            return rd.read_parquet(d)

    if os.path.exists(d):
        shutil.rmtree(d)  # partial output from a crashed run: rerun cleanly
    os.makedirs(d, exist_ok=True)

    t0 = time.time()
    ds = build()
    ds.write_parquet(d)
    out = rd.read_parquet(d)
    files = sorted(f for f in os.listdir(d) if f.endswith('.parquet'))
    # per-partition lineage (north-rule): row count per output file from
    # parquet footers — a resumed/debugged run can audit any partition
    import pyarrow.parquet as pq
    per_file = {}
    for f in files:
        try:
            per_file[f] = int(pq.ParquetFile(os.path.join(d, f)).metadata.num_rows)
        except Exception:
            per_file[f] = -1
    n_rows = sum(v for v in per_file.values() if v >= 0)
    lineage = {
        'stage': name,
        'rows_out': int(n_rows),
        'n_files': len(files),
        'rows_per_file': per_file,
        'wall_sec': round(time.time() - t0, 3),
        'completed_at': time.strftime('%Y-%m-%dT%H:%M:%S'),
    }
    if fp is not None:
        lineage['fingerprint'] = fp
    if extra_lineage:
        lineage.update(extra_lineage)
    with open(os.path.join(d, '_LINEAGE.json'), 'w') as f:
        json.dump(lineage, f, indent=2)
    with open(os.path.join(d, '_SUCCESS'), 'w') as f:
        f.write('')
    return out


def pipeline_report(root: str) -> Dict[str, dict]:
    """Collected lineage of every completed stage under root."""
    out = {}
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        lin = read_lineage(root, name)
        if lin is not None:
            out[name] = lin
    return out
