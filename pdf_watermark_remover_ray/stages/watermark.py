"""Event-time watermark: monotone tracker + deterministic late-data drops.

North-rule machinery with no reference equivalent; the reference contributes
the determinism discipline (fixed iteration order, ``watermark_processor.py:54,235``)
that the watermark must preserve: watermark advancement is a PURE FUNCTION of
the input stream + epoch slicing + config, so a killed and resumed run drops
exactly the same late rows (SURVEY.md §7.4 "Deterministic watermark").

Definition used everywhere (tracker, batch oracle, DuckDB SQL):

    watermark_after(e) = max(ts over all rows in epochs <= e) - lateness
    row r in epoch e is LATE  iff  e > 0 and r.ts < watermark_after(e - 1)

Late rows are dropped before they reach window / join state and are counted
per (epoch, partition) in the dead-letter metrics (reference analog:
``failed_files`` accumulation + end-of-run summary,
``watermark_processor.py:243,260-266``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa


@dataclass
class WatermarkTracker:
    """Driver-side monotone event-time watermark (microseconds)."""

    lateness_us: int
    max_ts_us: int = field(default=-(1 << 62))

    @property
    def watermark_us(self) -> int:
        return self.max_ts_us - self.lateness_us

    def observe(self, batch_max_ts_us: int) -> int:
        """Fold one epoch's max event time in; returns the new watermark.
        Monotone: max() never decreases."""
        self.max_ts_us = max(self.max_ts_us, int(batch_max_ts_us))
        return self.watermark_us


def arrival_order(event_id: np.ndarray, scramble_block: int) -> np.ndarray:
    """Deterministic arrival permutation: reverse within blocks of
    ``scramble_block`` ids.  The driver's event stream is ts-sorted; this
    injects reproducible event-time disorder (an out-of-order network) so the
    late-data path is exercised.  SQL-expressible:
    ``(event_id // B) * B + (B - 1 - event_id % B)``.
    """
    if scramble_block <= 1:
        return event_id
    b = scramble_block
    return (event_id // b) * b + (b - 1 - event_id % b)


def assign_epochs_by_event(ds, epoch_size: int, id_col: str = "event_id",
                           scramble_block: int = 1):
    """Deterministic epoch slicing of a bounded stream:
    ``epoch = arrival_order(id) // size``.

    Epochs model arrival order; slicing by a stable id column (not wall clock
    — deliberately diverging from the reference's ``time.time()`` naming,
    ``ui/app_ui.py:310``) keeps replays identical.
    """

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ep = (arrival_order(ids, scramble_block) // epoch_size).astype(np.int32)
        return t.append_column("epoch", pa.array(ep))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def late_rows(ds, lateness_us: int, epoch_size: int, id_col: str = "event_id",
              scramble_block: int = 1):
    """Batch oracle for the streaming late-drop rule.

    Two passes over the (lazy) dataset: a tiny per-epoch max-ts aggregate
    (partial per batch, merged with one small groupby), broadcast back into a
    vectorized filter.  Returns the dropped rows (conv_id, turn_idx, epoch).
    """
    ds = assign_epochs_by_event(ds, epoch_size, id_col=id_col,
                                scramble_block=scramble_block)

    def partial_max(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "epoch": t["epoch"].to_numpy(zero_copy_only=False),
                "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("epoch", sort=False)["ts_us"].max().reset_index(name="mx")
        return pa.Table.from_pandas(g, preserve_index=False)

    # epoch-domain-bounded partials: streamed driver fold (max), no AllToAll
    from ..pipelines.relational import _merge_bounded_partials

    per_epoch = _merge_bounded_partials(
        ds.map_batches(partial_max, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["epoch"], sums={"mx": "mx"}, how="max")
    if per_epoch is None:
        per_epoch = pd.DataFrame({"epoch": pd.Series([], dtype=np.int64),
                                  "mx": pd.Series([], dtype=np.int64)})
    per_epoch = per_epoch.sort_values("epoch")
    # watermark_after(e) as cumulative max minus lateness; lookup for e-1.
    wm_after = per_epoch["mx"].cummax().to_numpy() - lateness_us
    epochs = per_epoch["epoch"].to_numpy()
    # Dense lookup: wm_prev_arr[e] = watermark_after(e-1); -inf where undefined.
    neg_inf = -(1 << 62)
    wm_prev_arr = np.full(int(epochs.max()) + 2 if len(epochs) else 1, neg_inf, dtype=np.int64)
    for i in range(1, len(epochs)):
        wm_prev_arr[int(epochs[i])] = wm_after[i - 1]

    def filter_late(t: pa.Table) -> pa.Table:
        ep = t["epoch"].to_numpy(zero_copy_only=False)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        thresh = wm_prev_arr[ep]
        mask = ts < thresh
        return t.filter(pa.array(mask)).select(["conv_id", "turn_idx", "epoch"])

    return ds.map_batches(filter_late, batch_format="pyarrow", zero_copy_batch=True)
