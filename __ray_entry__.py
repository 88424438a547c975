"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship corpus-validation pipeline at sf0.001;
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2
(and the training-data additions: dedup, similarity search, text analysis,
multimodal plumbing); ``oracle_sql()`` gives the DuckDB-equivalent SQL for
each SQL-expressible query (same column names, fixed-point floats).

Ray is initialised by the driver BEFORE this module is imported — nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    input_hint corpus, validate the full schema, return violation rows."""
    from xema_ray.pipelines.queries import QUERIES

    return QUERIES["seq_violations"].fn("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from xema_ray.pipelines.queries import QUERIES

    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from xema_ray.pipelines.queries import (
        QUERIES,
        _drift_dirs,
        _ensure_nested,
        ensure_corpus,
    )

    # the oracle SQL reads the synthetic corpora from /tmp — make sure they
    # exist even if the driver runs the SQL before the Ray pipelines
    ensure_corpus("/root/testdata/sf0.01")
    _ensure_nested("/root/testdata/sf0.01")
    _drift_dirs("/root/testdata/sf0.01")
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
