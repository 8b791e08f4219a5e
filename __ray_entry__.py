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
    """Flagship: the end-to-end training-corpus curation funnel
    (clean gate → exact dedup → near-dup removal → benchmark
    decontamination → deterministic split) over the sf0.001 documents
    table — six oracle-checked operators composed into one pipeline
    (``searchengine_ray/pipelines/curate.py``; oracle-checked
    end-to-end as q63).  Returns the per-(split, source) survivor
    doc/token counts."""
    from searchengine_ray.pipelines.curate import curation_funnel

    return curation_funnel(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from searchengine_ray.pipelines.queries import oracle_sql as _o

    return _o()
