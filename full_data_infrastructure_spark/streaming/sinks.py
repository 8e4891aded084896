"""Streaming sinks beyond the main CDC parquet/Delta append — SURVEY.md
§2.1 S12 (the Kafka-consumer -> Slack webhook notifier) as ``foreachBatch``.

The reference runs a second, independent consumer group polling the topic,
filtering for activities with comments, and POSTing to Slack with
auto-commit (at-least-once) — ``slack_notifier/slack_notification.py:25-33,
97-126``. Here that's a ``foreachBatch`` sink over the same decoded stream:

* the notifier callable is pluggable (tests collect; production POSTs);
* at-least-once semantics are inherent to foreachBatch side effects — the
  batch may replay after a failure, so the notifier must be idempotent (the
  reference has the same caveat via Kafka auto-commit, documented nowhere);
* P9/P10: only rows with a non-null comment/required fields notify
  (slack_notification.py:51-59,121-124).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

Notifier = Callable[[dict], None]


def format_notification(row: dict) -> str:
    """The Slack message shape (slack_notification.py:63-72)."""
    return (
        f"New activity: {row.get('event_type', 'activity')} "
        f"by user {row.get('user_id', '?')} — {row.get('comment', '')}"
    )


def start_notification_sink(
    decoded: DataFrame,
    notify: Notifier,
    checkpoint_path: str,
    comment_col: str = "comment",
    required_cols: tuple[str, ...] = (),
    available_now: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """S12: filter rows worth notifying, then deliver per row via
    foreachBatch. Delivery happens on the driver in small batches — at
    scale the per-batch row count stays tiny because of the comment filter
    (the reference's ~29% comment rate), and the webhook is the bottleneck
    anyway; keep heavy fan-out OUT of foreachBatch."""
    filtered = decoded.filter(F.col(comment_col).isNotNull())
    for c in required_cols:
        filtered = filtered.filter(F.col(c).isNotNull())

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        # collect() is safe: the filtered notification stream is tiny by
        # construction; never do this with the raw stream.
        for row in batch_df.collect():
            notify(row.asDict())

    writer = filtered.writeStream.foreachBatch(deliver).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_upsert_sink(
    decoded: DataFrame,
    snapshot_path: str,
    checkpoint_path: str,
    key: str,
    order_col: str = "ts_ms",
    fmt: str = "parquet",
    available_now: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """CDC upsert sink: per micro-batch, apply full c/r/u/d op semantics to
    the snapshot table via :func:`~full_data_infrastructure_spark.streaming.
    cdc.apply_cdc_batch` (the Delta ``MERGE INTO`` equivalent; the append
    sink in cdc.py reproduces the reference's insert-only behavior, this one
    handles mutable sources).

    The parquet snapshot is swapped through a temp directory per batch —
    overwriting a path that is also being read corrupts the read. On Delta,
    replace the body with a transactional ``MERGE``; the checkpoint still
    dedups replayed batches, and apply_cdc_batch is idempotent per batch
    (tests/test_properties.py), so at-least-once replay converges.
    """
    import os
    import shutil
    import uuid

    from full_data_infrastructure_spark.streaming.cdc import apply_cdc_batch

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(snapshot_path):
            snapshot = spark.read.format(fmt).load(snapshot_path)
        else:
            snapshot = spark.createDataFrame(
                [], batch_df.drop("op", order_col).schema
            )
        merged = apply_cdc_batch(snapshot, batch_df, key=key, order_col=order_col)
        tmp = f"{snapshot_path.rstrip('/')}_swap_{uuid.uuid4().hex[:8]}"
        merged.write.format(fmt).mode("overwrite").save(tmp)
        if os.path.exists(snapshot_path):
            shutil.rmtree(snapshot_path)
        os.rename(tmp, snapshot_path)

    writer = decoded.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
