"""User-extension surface: a batch-transform pipeline builder (SURVEY §2.11).

The reference's engine is swappable behind a 2-method seam
(``main/remove_watermark.py:53-55``) and parametrized by user-supplied
patterns (``ui/app_ui.py:163-179``).  The engine-side generalization is a
``Transform`` protocol — any Arrow-batch → Arrow-batch callable (or a class
constructed once per actor, ST1) — registered on a :class:`PipelineBuilder`
that compiles them onto a ``ray.data.Dataset`` as chained ``map_batches``
stages.  Stateless callables run in the task pool; classes become actor-pool
stages with their ``concurrency`` / ``batch_size`` explicit.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa

Transform = Callable[[pa.Table], pa.Table]


@dataclass
class _Stage:
    fn: Any
    batch_format: str
    batch_size: int | None
    concurrency: int | None


@dataclass
class PipelineBuilder:
    """Composable batch-transform pipeline over a ``ray.data.Dataset``.

    >>> pipe = (PipelineBuilder()
    ...         .add(my_filter)                       # stateless task stage
    ...         .add(MyModelScorer, concurrency=4))   # actor-pool stage
    >>> out = pipe.run(ds)
    """

    stages: list[_Stage] = field(default_factory=list)

    def add(self, fn, *, batch_format: str = "pyarrow",
            batch_size: int | None = None,
            concurrency: int | None = None) -> "PipelineBuilder":
        """Register a transform.  A CLASS is treated as a stateful actor-pool
        stage (built once per actor, ST1 — pass ``concurrency``); a function
        runs in the stateless task pool."""
        if inspect.isclass(fn) and concurrency is None:
            concurrency = 1
        self.stages.append(_Stage(fn, batch_format, batch_size, concurrency))
        return self

    def run(self, ds):
        """Compile the registered transforms onto ``ds`` (lazy — the caller
        consumes the returned Dataset with write/iter/aggregate)."""
        for s in self.stages:
            kwargs: dict[str, Any] = {"batch_format": s.batch_format}
            if s.batch_size is not None:
                kwargs["batch_size"] = s.batch_size
            if s.concurrency is not None:
                kwargs["concurrency"] = s.concurrency
            if not inspect.isclass(s.fn):
                kwargs["zero_copy_batch"] = s.batch_format == "pyarrow"
            ds = ds.map_batches(s.fn, **kwargs)
        return ds
