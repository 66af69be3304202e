"""Structured Streaming over the events table + streaming KG extraction.

Two streaming entry points:

- ``streaming_event_counts``: watermarked tumbling-window counts per
  event_type — the streaming twin of ops.relational.events_minutely.
  Late rows beyond the watermark are dropped by Spark's state store; at
  cluster scale state is partitioned by (window, event_type), so the
  low-cardinality type key never concentrates state on one executor
  (window advances dominate the key space).

- ``streaming_extract``: the KG kernel bolted onto a readStream of docs —
  the same fused mapInPandas stage as the batch path (the kernel is
  oblivious to micro-batching), proving extraction works incrementally
  with exactly-once file-sink semantics + checkpointLocation.

Tests drive both with tiny file sources and the foreachBatch/memory sink
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def streaming_event_counts(events: DataFrame,
                           window: str = "1 minute",
                           watermark: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation (append-capable)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def streaming_dedup_docs(docs_stream: DataFrame,
                         watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: first-seen wins per content digest, with
    state bounded by the event-time watermark (dropDuplicatesWithinWatermark
    evicts digests older than the watermark, so state size tracks the
    duplicate-arrival window instead of corpus history — the only way a
    dedup stream survives 10^12 docs). Dedup key is the md5 of the text,
    never the text itself: state stores 16-byte digests.

    Streaming twin of ops.dedup.exact_duplicates' keep-first semantics
    (input: doc_id, ts event time, text)."""
    keyed = docs_stream.select(
        "doc_id", "ts", F.md5("text").alias("content_md5"))
    return (keyed.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_md5"]))


def streaming_extract(docs_stream: DataFrame) -> DataFrame:
    """Incremental KG extraction: same fused Arrow kernel as the batch
    pipeline, applied per micro-batch (map-only → no streaming state)."""
    from propertygraph_spark.pipeline.extract import extract_docs
    return extract_docs(docs_stream, route=False)


def run_to_memory(stream_df: DataFrame, query_name: str,
                  timeout_sec: float = 60.0, output_mode: str = "append"):
    """Drive a streaming DF to completion against a memory sink (test
    helper): processes all available data, then stops."""
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_sec)
    return q


# ------------------------------------------------------- stateful session

SESSION_OUTPUT_DDL = ("user_id long, session_start timestamp, "
                      "session_end timestamp, n_events long, "
                      "sum_value double")
SESSION_STATE_DDL = ("start long, last long, n long, total double")


def streaming_user_sessions(events: DataFrame,
                            gap_sec: int = 1800) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState: state
    per user_id = (session_start, last_ts, n_events, sum_value); a
    completed session is emitted whenever a gap > gap_sec is observed or
    the group times out. State is partitioned by user_id across the
    cluster — the streaming twin of ops.relational.user_sessions."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                rows.append((user_id, pd.Timestamp(start, unit="s"),
                             pd.Timestamp(last, unit="s"), n, total))
                state.remove()
            yield pd.DataFrame(rows, columns=[
                "user_id", "session_start", "session_end", "n_events",
                "sum_value"])
            return
        events_df = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        for ts, value in zip(events_df["ts"], events_df["value"]):
            sec = int(pd.Timestamp(ts).timestamp())
            if start is None:
                start, last, n, total = sec, sec, 1, float(value)
            elif sec - last > gap_sec:
                rows.append((user_id, pd.Timestamp(start, unit="s"),
                             pd.Timestamp(last, unit="s"), n, total))
                start, last, n, total = sec, sec, 1, float(value)
            else:
                last, n, total = sec, n + 1, total + float(value)
        state.update((start, last, n, total))
        state.setTimeoutDuration(gap_sec * 1000)
        yield pd.DataFrame(rows, columns=[
            "user_id", "session_start", "session_end", "n_events",
            "sum_value"])

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_OUTPUT_DDL, SESSION_STATE_DDL,
                "append", GroupStateTimeout.ProcessingTimeTimeout))
