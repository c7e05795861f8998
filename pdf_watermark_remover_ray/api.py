"""The reference's 2-method processor seam, re-expressed for Parquet tables.

The reference exposes exactly two entry points behind its swappable processor
interface (``main/remove_watermark.py:53-55``):
``remove_watermark_by_structure(pdf_path, output_path, name_pattern,
footer_pattern)`` and ``process_folder(input_folder, output_folder, ...)``
(``mechanisms/watermark_processor.py:23-30,204-212``).  These are their
engine equivalents over transcript/document Parquet: same signature shape,
same boolean success contract, same continue-on-failure folder semantics with
an end-of-run summary.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray.data

from .config import ScrubConfig
from .functions.scrub import scrub_dataset


def resolve_output_path(input_path: str, output_path: str | None) -> str:
    """Destination-defaulting rules (reference S8 tail,
    ``ui/app_ui.py:309-321``: derive the output when the field is empty or a
    directory):

    - empty/None → alongside the input as ``<stem>_scrubbed.parquet``;
    - an existing directory (or trailing separator) → input's basename
      inside that directory;
    - anything else → taken verbatim as the output file path.
    """
    if not output_path:
        stem, ext = os.path.splitext(input_path)
        return f"{stem}_scrubbed{ext or '.parquet'}"
    if output_path.endswith(os.sep) or os.path.isdir(output_path):
        return os.path.join(output_path, os.path.basename(input_path))
    return output_path


def scrub_file(
    input_path: str,
    output_path: str | None,
    name_pattern: str,
    footer_pattern: str = "DOCUMENT NON APPLICABLE",
    text_col: str = "text",
) -> bool:
    """Scrub one Parquet file (reference: ``remove_watermark_by_structure``,
    watermark_processor.py:23-202).

    Reads, applies T1-T5 to the text column, writes to a staging temp path
    and atomically publishes (the reference's temp-file + copy2 discipline,
    :46-47,166-175 — here an ``os.replace`` so a crash never leaves a partial
    output).  Returns True on success, False on failure (never raises —
    failure isolation is the caller's contract, :197-202).

    The write STREAMS: scrubbed blocks flow through ``iter_batches`` into a
    ``ParquetWriter`` row-group at a time, so driver memory is O(one batch)
    even when a user points this desktop-seam API at a file far larger than
    the driver's heap (the single-file output contract forces a single
    writer; a concat of all blocks would force the whole table).  The
    engine's scale sink remains the partitioned `sinks.parquet.EpochSink`.
    """
    writer = None
    try:
        output_path = resolve_output_path(input_path, output_path)
        ds = ray.data.read_parquet(input_path)
        cfg = ScrubConfig(name_pattern=name_pattern, footer_pattern=footer_pattern,
                          use_footer=bool(footer_pattern))
        out = scrub_dataset(ds, cfg, text_col=text_col)
        staging = output_path + ".staging"
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        for batch in out.iter_batches(batch_format="pyarrow",
                                      batch_size=65_536):
            if writer is None:
                writer = pq.ParquetWriter(staging, batch.schema)
            writer.write_table(batch)
        if writer is None:  # empty input: publish an empty table, same schema
            import pyarrow as pa

            empty = pa.schema(out.schema().base_schema).empty_table()
            pq.write_table(empty, staging)
        else:
            writer.close()
            writer = None
        os.replace(staging, output_path)
        return True
    except Exception:
        if writer is not None:
            try:
                writer.close()
            except Exception:
                pass
        return False


def process_folder(
    input_folder: str,
    output_folder: str,
    name_pattern: str,
    footer_pattern: str = "DOCUMENT NON APPLICABLE",
    recursive: bool = False,
) -> tuple[bool, list[str]]:
    """Scrub every ``.parquet`` file in a folder (reference:
    ``process_folder``, watermark_processor.py:204-288).

    Mirrors the reference exactly: create the output folder (:222-232),
    enumerate by suffix predicate (:235 — non-recursive BY DEFAULT, matching
    the reference; ``recursive=True`` walks subdirectories and mirrors the
    relative layout under ``output_folder``), empty-source guard (:238-241),
    per-file processing that CONTINUES on failure and accumulates
    ``failed_files`` (:243-262), and a final all-succeeded boolean
    (:264-281).  Returns ``(all_succeeded, failed_files)`` — failed names
    are folder-relative paths.
    """
    try:
        os.makedirs(output_folder, exist_ok=True)
    except OSError:
        return False, []
    if recursive:
        files = [os.path.relpath(os.path.join(root, f), input_folder)
                 for root, _, names in os.walk(input_folder)
                 for f in names if f.lower().endswith(".parquet")]
        files.sort()
    else:
        files = sorted(f for f in os.listdir(input_folder)
                       if f.lower().endswith(".parquet"))
    if not files:
        return False, []
    failed: list[str] = []
    for fname in files:
        out_path = os.path.join(output_folder, fname)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        ok = scrub_file(
            os.path.join(input_folder, fname),
            out_path,
            name_pattern,
            footer_pattern,
        )
        if not ok:
            failed.append(fname)
    return (not failed), failed
