"""Ray-Data-native structured-streaming / data-processing engine.

A from-scratch engine with the query and data-processing capabilities of the
reference ``Alexandre-Caby/pdf-watermark-remover`` (a sequential pattern-scrub
dataflow over document streams — see SURVEY.md), re-expressed over columnar
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``:

- the reference's scrub kernel (T1-T5, ``mechanisms/watermark_processor.py:67-155``)
  as a vectorized ``map_batches`` transform (:mod:`.functions.scrub`);
- event-time windows (tumbling / sliding / session), watermarks and late-data
  drops (:mod:`.stages.windows`, :mod:`.stages.watermark`);
- a stateful stream-stream join (:mod:`.stages.join`);
- an exactly-once staged Parquet sink with epoch markers (:mod:`.sinks.parquet`,
  descendant of the reference's temp-file + ``copy2`` staging,
  ``watermark_processor.py:46-47,166-195``);
- checkpoint / resume via per-partition state snapshots (:mod:`.state`);
- large-scale training-data operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal stubs (:mod:`.pipelines`).

Nothing here calls ``ray.init()`` — the driver / test fixture / bench own the
Ray session.
"""

__version__ = "0.1.0"
