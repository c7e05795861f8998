"""Exactly-once staged Parquet sink with epoch markers.

Direct descendant of the reference's staging discipline — write the full
result to a temp location first, then copy to the destination, keep the temp
on failure (``mechanisms/watermark_processor.py:46-47,166,171-195``) — made
idempotent and deterministic for a distributed stream:

- every (epoch, stream, partition) output is written to
  ``out/_staging/epoch={e}/{stream}/part-{p:05d}.parquet``;
- committing epoch *e* atomically ``os.replace``s each staged file into
  ``out/data/{stream}/epoch={e}/`` and finally writes the marker
  ``out/_epochs/epoch-{e}.json`` — the marker IS the commit point;
- re-running an epoch overwrites staging and re-publishes the identical
  files, so task retries and kill/resume never duplicate or lose rows;
- file names are deterministic functions of (epoch, partition) — NEVER
  wall-clock (deliberately diverging from the reference's
  ``time.time()`` suffixes, ``ui/app_ui.py:310``, which would break
  exactly-once under replay).

Layout (SURVEY.md §2.1 S5-S8):

    out/
      data/{turns,sessions,matches,windows,late}/epoch={e}/part-{p:05d}.parquet
      _state/epoch={e}/part-{p:05d}.parquet     (checkpoint snapshots)
      _staging/epoch={e}/...                    (scratch, survives crashes)
      _epochs/epoch-{e}.json                    (commit markers + metrics)
"""

from __future__ import annotations

import json
import os

STREAMS = ("turns", "sessions", "matches", "windows", "wstats", "sliding",
           "wdistinct", "wtopk", "late", "dedup", "cep", "cepk", "cepp",
           "timeouts", "enrich", "wquant")


class EpochSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        for sub in ("data", "_staging", "_epochs", "_state"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    # -- paths -------------------------------------------------------------

    def staging_path(self, epoch: int, stream: str, partition: int) -> str:
        d = os.path.join(self.out_dir, "_staging", f"epoch={epoch}", stream)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"part-{partition:05d}.parquet")

    def staging_state_path(self, epoch: int, partition: int) -> str:
        d = os.path.join(self.out_dir, "_staging", f"epoch={epoch}", "_state")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"part-{partition:05d}.parquet")

    def data_dir(self, stream: str, epoch: int) -> str:
        return os.path.join(self.out_dir, "data", stream, f"epoch={epoch}")

    def state_path(self, epoch: int, partition: int) -> str:
        return os.path.join(self.out_dir, "_state", f"epoch={epoch}",
                            f"part-{partition:05d}.parquet")

    def marker_path(self, epoch: int) -> str:
        return os.path.join(self.out_dir, "_epochs", f"epoch-{epoch}.json")

    # -- commit protocol ---------------------------------------------------

    def commit_epoch(self, epoch: int, marker: dict) -> None:
        """Atomically publish staged files then write the marker."""
        stage_root = os.path.join(self.out_dir, "_staging", f"epoch={epoch}")
        for stream in STREAMS:
            src_dir = os.path.join(stage_root, stream)
            if not os.path.isdir(src_dir):
                continue
            dst_dir = self.data_dir(stream, epoch)
            os.makedirs(dst_dir, exist_ok=True)
            for fn in sorted(os.listdir(src_dir)):
                os.replace(os.path.join(src_dir, fn), os.path.join(dst_dir, fn))
        src_state = os.path.join(stage_root, "_state")
        if os.path.isdir(src_state):
            dst_state = os.path.join(self.out_dir, "_state", f"epoch={epoch}")
            os.makedirs(dst_state, exist_ok=True)
            for fn in sorted(os.listdir(src_state)):
                os.replace(os.path.join(src_state, fn), os.path.join(dst_state, fn))
        tmp = self.marker_path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f, sort_keys=True)
        os.replace(tmp, self.marker_path(epoch))

    def committed_epochs(self) -> list[int]:
        d = os.path.join(self.out_dir, "_epochs")
        out = []
        for fn in os.listdir(d):
            if fn.startswith("epoch-") and fn.endswith(".json"):
                out.append(int(fn[len("epoch-"):-len(".json")]))
        return sorted(out)

    def read_marker(self, epoch: int) -> dict:
        with open(self.marker_path(epoch)) as f:
            return json.load(f)

    def last_contiguous_epoch(self) -> int:
        """Highest e such that 0..e are ALL committed (resume point)."""
        done = set(self.committed_epochs())
        e = -1
        while (e + 1) in done:
            e += 1
        return e

    # -- small-file compaction (reference S6: output compaction,
    # watermark_processor.py:166 save(garbage=4, deflate=True)) -------------

    def compact_epoch(self, stream: str, epoch: int) -> int:
        """Merge a committed epoch's many small per-task files into one
        Parquet file via a directory swap (write to ``epoch={e}.compact``,
        two renames, remove the old dir).  Only run on COMMITTED epochs and
        with no concurrent readers; rerunning after a crash between the two
        renames: if ``epoch={e}`` is missing but ``epoch={e}.compact``
        exists, finish by renaming it in.  Returns rows compacted."""
        import shutil

        import pyarrow.parquet as _pq

        src = self.data_dir(stream, epoch)
        compact = src + ".compact"
        old = src + ".old"
        if not os.path.isdir(src) and os.path.isdir(compact):
            os.rename(compact, src)  # crash recovery: finish the swap
            return -1
        files = sorted(os.path.join(src, f) for f in os.listdir(src)
                       if f.endswith(".parquet"))
        if len(files) <= 1:
            return 0
        import pyarrow as _pa

        # read per file (ParquetDataset would hive-infer a conflicting
        # `epoch` partition column from the epoch={e} directory name)
        tbl = _pa.concat_tables([_pq.read_table(f) for f in files])
        shutil.rmtree(compact, ignore_errors=True)
        os.makedirs(compact)
        _pq.write_table(tbl, os.path.join(compact, "part-00000.parquet"))
        shutil.rmtree(old, ignore_errors=True)
        os.rename(src, old)
        os.rename(compact, src)
        shutil.rmtree(old)
        return len(tbl)

    # -- cross-epoch compaction (stream-level re-layout) ---------------------

    @staticmethod
    def _parse_epoch_dir(name: str) -> tuple[int, int] | None:
        """``epoch={e}`` → (e, e); ``epoch={lo}-{hi}`` (a committed combined
        range) → (lo, hi); anything else (``.compact`` scratch, ``.old``) →
        None."""
        if not name.startswith("epoch=") or name.endswith((".compact", ".old")):
            return None
        span = name[len("epoch="):]
        try:
            if "-" in span:
                lo, hi = span.split("-", 1)
                return int(lo), int(hi)
            e = int(span)
            return e, e
        except ValueError:
            return None

    def recover_stream_compaction(self, stream: str) -> None:
        """Finish a crashed :meth:`compact_stream`: a published combined dir
        ``epoch={lo}-{hi}`` is the commit point, so any source dir whose span
        it covers is garbage (the crash hit between publish and source
        removal) — remove it; unpublished ``.compact`` scratch is rolled
        back.  Idempotent."""
        import shutil

        root = os.path.join(self.out_dir, "data", stream)
        if not os.path.isdir(root):
            return
        for fn in os.listdir(root):
            if fn.endswith(".compact"):
                shutil.rmtree(os.path.join(root, fn), ignore_errors=True)
        spans = {}
        for fn in os.listdir(root):
            s = self._parse_epoch_dir(fn)
            if s:
                spans[fn] = s
        for fn, (lo, hi) in spans.items():
            for other, (olo, ohi) in spans.items():
                if other != fn and olo <= lo and hi <= ohi \
                        and (hi - lo) < (ohi - olo):
                    shutil.rmtree(os.path.join(root, fn), ignore_errors=True)
                    break

    def compact_stream(self, stream: str, target_bytes: int = 128 << 20,
                       upto_epoch: int | None = None) -> dict:
        """CROSS-epoch re-layout: merge a committed epoch range's files into
        ~``target_bytes`` output files under ONE combined dir
        ``epoch={lo}-{hi}`` — the small-file hygiene a long-running stream
        needs at scale (per-epoch compaction still leaves one file per epoch;
        a day of 1-minute epochs is 1440 files).

        Crash-safe with a single atomic commit point, same discipline as
        :meth:`compact_epoch`: groups are written to ``epoch={lo}-{hi}.compact``,
        one ``os.rename`` publishes the dir, then the source dirs are removed;
        :meth:`recover_stream_compaction` (run first, and safe at every
        startup) finishes either side of a crash.  Resume-safe: epoch COMMIT
        markers are untouched, so a resumed run still skips 0..last_contiguous
        and appends ``epoch={e+1}`` beside the combined dir; readers' layout
        contract (``data/{stream}/epoch=*/part-*.parquet``) is unchanged, and
        rows keep their provenance via the in-row ``epoch`` column.

        Only epochs ≤ ``upto_epoch`` (default: the contiguous committed
        prefix) are touched.  Previously combined ranges participate, so
        periodic re-compaction converges to ~target-size files.  Returns
        ``{files_in, files_out, rows, lo, hi}``.
        """
        import shutil

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        self.recover_stream_compaction(stream)
        limit = self.last_contiguous_epoch() if upto_epoch is None else upto_epoch
        root = os.path.join(self.out_dir, "data", stream)
        sources = []  # (lo, hi, path)
        if os.path.isdir(root):
            for fn in os.listdir(root):
                s = self._parse_epoch_dir(fn)
                if s and s[1] <= limit:
                    sources.append((s[0], s[1], os.path.join(root, fn)))
        sources.sort()
        files = []  # (path, size) in epoch order
        for _, _, d in sources:
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".parquet"):
                    p = os.path.join(d, fn)
                    files.append((p, os.path.getsize(p)))
        if len(sources) <= 1 or len(files) <= 1:
            return {"files_in": len(files), "files_out": len(files),
                    "rows": 0, "lo": None, "hi": None}
        lo, hi = sources[0][0], sources[-1][1]
        # greedy size binning in epoch order (≥1 file per group)
        groups, cur, cur_sz = [], [], 0
        for p, sz in files:
            if cur and cur_sz + sz > target_bytes:
                groups.append(cur)
                cur, cur_sz = [], 0
            cur.append(p)
            cur_sz += sz
        groups.append(cur)
        tmp = os.path.join(root, f"epoch={lo}-{hi}.compact")
        final = os.path.join(root, f"epoch={lo}-{hi}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        rows = 0
        for i, grp in enumerate(groups):
            tbl = _pa.concat_tables([_pq.read_table(p) for p in grp])
            rows += len(tbl)
            _pq.write_table(tbl, os.path.join(tmp, f"part-{i:05d}.parquet"))
        os.rename(tmp, final)  # commit point
        for _, _, d in sources:
            if d != final:
                shutil.rmtree(d)
        return {"files_in": len(files), "files_out": len(groups),
                "rows": rows, "lo": lo, "hi": hi}
