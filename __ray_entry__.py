"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline over pages
synthesized deterministically from ``/root/testdata/sf0.001``;
``queries()`` exposes each implemented operator over ``sf_dir`` tables;
``oracle_sql()`` gives the DuckDB-equivalent SQL.  Ray is initialised
by the driver before import — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from rapidocr_ray.pipelines.extract import build_extract_pipeline
    from rapidocr_ray.sources.pages import pages_ds_from_documents

    return build_extract_pipeline(pages_ds_from_documents(SF0001))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from rapidocr_ray.pipelines import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for the SQL-expressible queries."""
    from rapidocr_ray.pipelines import queries as q

    return q.ORACLE_SQL
