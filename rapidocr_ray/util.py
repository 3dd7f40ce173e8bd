"""Worker-importability shim.

The graft driver owns the Ray session and may have initialised it from
any working directory; Ray worker processes then cannot import
``rapidocr_ray`` by module path unless the repo root happens to be on
their ``sys.path``.  ``ensure_worker_importable()`` registers every
loaded ``rapidocr_ray*`` module for cloudpickle by-value serialization,
so tasks/actors ship their own code (a few tens of KB, once per actor)
instead of relying on an import that may fail on the worker.

Idempotent; called at pipeline-build time by pipelines/extract.py and
pipelines/queries.py.  No ray.init here (session belongs to the
caller).
"""

from __future__ import annotations

import sys

_registered: set[str] = set()


def ensure_worker_importable() -> None:
    # No early-return on "done": modules imported lazily after the first
    # call (e.g. stages.dedup inside a later query) must still be
    # registered, or they'd serialize by reference and fail to import on
    # workers launched from a non-repo CWD.
    try:
        from ray import cloudpickle  # same pickler Ray uses for tasks
    except Exception:  # pragma: no cover
        import cloudpickle  # type: ignore
    for name in sorted(sys.modules):
        if name in _registered:
            continue
        if name == "rapidocr_ray" or name.startswith("rapidocr_ray."):
            mod = sys.modules[name]
            try:
                cloudpickle.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:  # pragma: no cover — best-effort
                pass
