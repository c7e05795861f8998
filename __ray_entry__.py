"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship streaming pipeline (scrub → windows → watermark
→ stateful join → exactly-once sink) over /root/testdata/sf0.001-derived
transcripts; ``queries()`` exposes every operator of SURVEY.md §2 (plus the
training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible operator.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pdf_watermark_remover_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the full streaming engine
    (epochs, watermark, stateful sessions/join, exactly-once sink) plus the
    batch window/join queries over the derived transcript stream; returns the
    emitted turn rows (stable (conv_id, turn_idx) order)."""
    return _q.q_streaming_e2e("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
