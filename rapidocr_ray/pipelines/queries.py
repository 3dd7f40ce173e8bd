"""Driver-facing query registry: one entry per implemented operator
(SURVEY.md §2 + the training-data-pipeline extensions), each over the
testdata tables in ``sf_dir``, with DuckDB oracle SQL where the
semantics are SQL-expressible.

Column names in each Ray result match the SQL aliases exactly (the
driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow.parquet as pq


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    from rapidocr_ray.util import ensure_worker_importable

    ensure_worker_importable()
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Extraction pipeline over pages synthesized from documents (flagship).
# SQL-expressible because pages_from_documents makes extraction
# recover documents.text byte-for-byte (tests/test_pipeline_e2e.py).
# ---------------------------------------------------------------------------


def q_extract_pages(sf_dir: str):
    from rapidocr_ray.pipelines.extract import extract_pages_table
    from rapidocr_ray.sources.pages import pages_from_documents

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    pages = pages_from_documents(docs)
    ds = extract_pages_table(pages, dedup=False)
    return ds.select_columns(["url", "route", "extracted_text"])


SQL_EXTRACT_PAGES = """
SELECT 'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 20 < 16 THEN 'html'
            WHEN doc_id % 20 < 19 THEN 'bitmap'
            ELSE 'empty' END AS route,
       CASE WHEN doc_id % 20 < 19 THEN text ELSE NULL END AS extracted_text
FROM documents
"""


def q_route_counts(sf_dir: str):
    """M17 routing-counts analog: grouped counts per (lang, source)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n_docs"))


SQL_ROUTE_COUNTS = """
SELECT lang, source, COUNT(*) AS n_docs FROM documents GROUP BY lang, source
"""


QUERIES: dict[str, Callable[[str], Any]] = {
    "extract_pages": q_extract_pages,
    "route_counts": q_route_counts,
}

ORACLE_SQL: dict[str, str] = {
    "extract_pages": SQL_EXTRACT_PAGES,
    "route_counts": SQL_ROUTE_COUNTS,
}
