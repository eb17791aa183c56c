"""Custom stateful streaming operators (applyInPandasWithState).

The engine's crawl loop keeps its state in the batch store (exactly-once
via the manifest protocol — streaming/stream_loop.py). These operators
cover the OTHER stateful shape a training-data pipeline needs: per-key
state that lives inside the streaming engine itself, for feeds where the
state is small and flow-through (sessionization, per-host counters).

``stream_host_sessions`` — event sessionization per host: events closer
than ``gap_seconds`` belong to one session; a larger gap closes the
session and emits (host, session_start, session_end, n_events). The
reference has no streaming analog (its ingestion is a beanstalkd poll
loop, crawler/worker/crawl_job_listener.py:126-360); this is the
canonical applyInPandasWithState pattern the north rule's streaming axis
calls for, with Arrow-batched state updates and no per-row Python.

Determinism: session boundaries are data-defined (event timestamps
only); events are sorted per (host, ts, event_id) inside the handler, so
output is independent of arrival order and parallelism. Open sessions
stay in state (emitted only when closed by a later event) — a finite
replay emits exactly the closed sessions, deterministically.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_ns = gap_seconds * 1_000_000_000

    def fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        events = pd.concat(list(pdfs), ignore_index=True)
        # data-defined order: ts, then event_id as the total tiebreaker
        events = events.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to ns regardless of the Arrow-side timestamp unit
        ts_ns = events["ts"].astype("datetime64[ns]").astype("int64").tolist()

        if state.exists:
            start_ns, last_ns, n = state.get
        else:
            start_ns, last_ns, n = None, None, 0

        closed: list[tuple[Any, Any, int]] = []
        for t in ts_ns:
            if start_ns is None:
                start_ns, last_ns, n = t, t, 1
            elif t - last_ns <= gap_ns:
                last_ns, n = t, n + 1
            else:
                closed.append((start_ns, last_ns, n))
                start_ns, last_ns, n = t, t, 1
        state.update((start_ns, last_ns, n))

        if closed:
            yield pd.DataFrame(
                {
                    "host": [host] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="ns"
                    ),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="ns"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def stream_host_sessions(
    events_stream,
    gap_seconds: int = 1800,
    query_name: str = "host_sessions",
):
    """Start the sessionization query over a streaming DataFrame with
    columns (host string, event_id long, ts timestamp). Emits CLOSED
    sessions (append mode) into a memory sink named ``query_name``."""
    sessions = events_stream.groupBy("host").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
