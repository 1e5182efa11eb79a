"""caligraph_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the query / data-processing capabilities of the CaLiGraph
extraction framework (reference: nheist/CaLiGraph, read-only copy at
/root/reference) as a brand-new engine built on ``ray.data.Dataset``
pipelines: ``map_batches`` over zero-copy Arrow batches for the parse /
normalize / score stages, actor pools for stateful stages (alias index
lookup, model scoring), ``groupby``/``aggregate`` for the wide stages
(alias-index build, axiom mining, canonicalization) and partitioned
Parquet sinks for resumable output.

Nothing in here calls ``ray.init()``; the embedding application (driver,
bench.py, pytest fixture) owns the Ray session.
"""

__version__ = "0.1.0"
