"""Custom stateful streaming operators (beyond-reference; the engine
capability SURVEY §2.10 notes the reference never needed).

  - streaming_event_counts: watermarked tumbling-window aggregation.
  - streaming_dedup: watermarked exact dedup with bounded state.
  - sessionize_stateful: per-user session assembly with
    applyInPandasWithState — the custom-stateful-operator escape hatch
    for semantics window functions can't express incrementally (open
    sessions carried across micro-batches, closed by event-time gap).

Timeout design note: EventTimeTimeout, not ProcessingTimeTimeout — a
wall-clock timeout equal to the session gap makes availableNow runs hang
until it fires; event-time timeouts advance with the watermark, so batch
(availableNow) and continuous runs behave identically.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type; late rows
    beyond the watermark are dropped by the engine."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each key wins, re-deliveries
    within the watermark horizon are dropped, and the per-key state is
    evicted once the watermark passes (bounded state — the property that
    lets this run forever; an unwatermarked dropDuplicates grows state
    without bound).

    This is the streaming face of operators/dedup.exact_dedup: the
    at-least-once receiving feed (SURVEY §2.10 — the reference dedupes by
    inserting documents keyed on content hash) becomes exactly-once
    downstream. Key by the content hash column for document feeds."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"
GAP_SECONDS = 1800


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Carry the open session in state; emit sessions closed by the
    event-time gap (from newer events of the same key, or from the
    watermark passing the session's timeout)."""
    (user_id,) = key
    closed: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
    else:
        ts = sorted(
            int(t.timestamp())
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts:
            if last is not None and t - last > GAP_SECONDS:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                start = t if start is None else start
                last = t
                n += 1
        if start is not None:
            state.update((start, last, n))
            timeout_ms = (last + GAP_SECONDS) * 1000
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))

    yield pd.DataFrame(
        [(u, pd.Timestamp(s, unit="s"), pd.Timestamp(e, unit="s"), n)
         for u, s, e, n in closed],
        columns=["user_id", "session_start", "session_end", "n_events"],
    )


def sessionize_stateful(events: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """Streaming sessionization: groupBy(user).applyInPandasWithState.
    Emits a row per CLOSED session (append mode); open sessions stay in
    state until newer events or the watermark close them."""
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


FUNNEL_OUTPUT_SCHEMA = "user_id long, ts_0 long, ts_1 long, ts_2 long"
#: earliest in-order chain progress: -1 sentinels for steps not reached
FUNNEL_STATE_SCHEMA = "t0 long, t1 long, t2 long, emitted boolean"
FUNNEL_STEPS = ("signup", "click", "purchase")


def _funnel_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Advance the greedy earliest in-order chain with each micro-batch;
    emit the user's completion row exactly once, when step 3 first
    lands. Earliest-first is order-insensitive across batches as long
    as each batch's events are replayed in time order: taking the min
    feasible timestamp per step is monotone."""
    (user_id,) = key
    t0, t1, t2, emitted = state.get if state.exists else (-1, -1, -1, False)
    evs = sorted(
        (int(t.timestamp() * 1_000_000), s)
        for pdf in pdfs
        for t, s in zip(pd.to_datetime(pdf["ts"]), pdf["event_type"])
    )
    for ts, step in evs:
        if step == FUNNEL_STEPS[0] and t0 == -1:
            t0 = ts
        elif step == FUNNEL_STEPS[1] and t0 != -1 and ts > t0 and t1 == -1:
            t1 = ts
        elif step == FUNNEL_STEPS[2] and t1 != -1 and ts > t1 and t2 == -1:
            t2 = ts
    out: list[tuple] = []
    if t2 != -1 and not emitted:
        out.append((user_id, t0, t1, t2))
        emitted = True
    state.update((t0, t1, t2, emitted))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "ts_0", "ts_1", "ts_2"])


def funnel_stateful(events: DataFrame) -> DataFrame:
    """Streaming strict-order funnel: per-user chain progress lives in
    applyInPandasWithState; each completion emits exactly once. The
    streaming face of operators/funnel.funnel_steps (exact for per-user
    in-order delivery; late out-of-order steps can only delay, never
    corrupt, a completion)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_group,
            FUNNEL_OUTPUT_SCHEMA,
            FUNNEL_STATE_SCHEMA,
            "append",  # each completion row is emitted exactly once
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    join_key: str = "ad_id",
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join: attribute each click to the
    impression it followed, where the click lands within
    *attribution_window* after the impression — the canonical two-stream
    correlation (ad attribution, request/response pairing, order/ship
    matching).

    Both sides carry a watermark and the join condition bounds click
    time to [impression_ts, impression_ts + window], so Spark can evict
    impression state once the click watermark passes the window end —
    bounded state on two unbounded streams, the property that separates
    this from a naive cache-one-side join. Output columns:
    (join_key, imp_ts, click_ts, lag_seconds)."""
    imp = impressions.withWatermark("imp_ts", watermark)
    clk = clicks.withWatermark("click_ts", watermark)
    cond = (
        (imp[join_key] == clk[join_key])
        & (clk["click_ts"] >= imp["imp_ts"])
        & (clk["click_ts"] <= imp["imp_ts"] + F.expr(f"INTERVAL {attribution_window}"))
    )
    return imp.join(clk, cond, "inner").select(
        imp[join_key].alias(join_key),
        imp["imp_ts"].alias("imp_ts"),
        clk["click_ts"].alias("click_ts"),
        ((F.unix_micros(clk["click_ts"]) - F.unix_micros(imp["imp_ts"])) / 1000000.0
         ).alias("lag_seconds"),
    )
