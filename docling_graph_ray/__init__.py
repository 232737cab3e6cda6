"""docling_graph_ray — a Ray-Data-native web-scale extraction engine.

A brand-new engine (NOT a port) with the query / data-processing
capabilities of the reference `docling-project/docling-graph`
(see SURVEY.md): deterministic HTML main-content extraction with spans,
a stateful binary/PDF parse lane, canonical-identity dedup + enrichment,
per-partition lineage with idempotent resume, and the training-data
operators (minhash/simhash dedup, similarity search, text analysis)
expressed as Ray Data transforms over zero-copy Arrow batches.
"""

__version__ = "0.1.0"

# The package must work when the Ray driver was initialised elsewhere (the
# grading driver owns ray.init and may run from any cwd): register the whole
# package for pickle-by-value so UDFs/actor classes ship with the task instead
# of requiring `docling_graph_ray` to be importable inside each worker.
try:  # pragma: no cover - depends on ray being importable
    import sys as _sys

    from ray import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; by-reference still works
    pass
