"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline over /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` — the operator catalog
(searchengine_ray.pipelines.queries), one entry per operator family
from SURVEY.md §2 plus the training-data operators.

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Ray workers need the repo root on PYTHONPATH to unpickle
# searchengine_ray.* UDFs (workers don't inherit driver sys.path).
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: document quality + language-ID + exact-dedup survivor
    stats over the sf0.001 documents table, as one Ray Data pipeline."""
    import pandas as pd

    from searchengine_ray.pipelines.queries import _read
    from searchengine_ray.stages import text as tx

    ds = _read(SF_SMOKE, "documents", ["doc_id", "text"])

    def enrich(b: pd.DataFrame) -> pd.DataFrame:
        q = tx.quality_score(b)
        l = tx.langid(b)
        return q.merge(l, on="doc_id")

    return ds.map_batches(enrich, batch_format="pandas")


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from searchengine_ray.pipelines.queries import oracle_sql as _o

    return _o()
