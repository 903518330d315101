"""Reconnection workflow for the feed-bus streaming path (SURVEY
S1/ST7; reference src/tastytrade/connections/sockets.py:154-312 state
machine, connections/signals.py ReconnectSignal, and the injected-
failure surface tested by
unit_tests/connections/test_reconnection_workflow.py).

The reference drives a websocket: a dropped connection (or auth
expiry/timeout) triggers a ReconnectSignal, the manager tears the
socket down, reconnects, re-authorizes, and re-subscribes every
channel from its last position. The Spark-native carrier for that
contract is the streaming query lifecycle:

- a "connection" is a running StructuredStreaming query over the
  envelope bus (sources/feedbus.py);
- an injected drop = stopping the query with a recorded reason
  (``inject_connection_dropped`` — the reference's failure-injection
  hook, sockets.py `simulate_failure`);
- reconnect + re-subscribe-from-last-position has TWO Spark forms,
  both implemented:

  1. ``reconnect(resume="checkpoint")`` — restart against the SAME
     checkpoint: the committed source offsets are the subscription
     position, continuation is exactly-once (no redelivery possible).
  2. ``reconnect(resume="sink")`` — the checkpoint is gone (the
     reference's cold re-handshake): recover positions by scanning
     the sink's max offset per channel and re-open the bus with a
     ``starting_offsets`` dict. The bus replays strictly-after those
     offsets; at-least-once redeliveries racing the drop are absorbed
     by the (channel, symbol, offset)-keyed idempotent sink merge.

Either way the sink converges to exactly-one row per envelope — the
property the reference's ack/replay contract guarantees and the tests
here assert end-to-end on a LIVE streaming query with injected
disconnects (tests/test_feedbus.py::TestReconnectionWorkflow).
"""

from __future__ import annotations

import os
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tastytrade_sdk_spark.sources.feedbus import (
    _latest_offsets,
    feed_bus_stream,
)

# Reconnect reasons (reference config/enumerations.py ReconnectReason)
CONNECTION_DROPPED = "connection_dropped"
AUTH_EXPIRED = "auth_expired"
TIMEOUT = "timeout"
MANUAL_TRIGGER = "manual_trigger"

# Connection states (reference sockets.py ConnectionState)
DISCONNECTED = "disconnected"
CONNECTED = "connected"
ERROR = "error"


class ReconnectSignal:
    """Latched reconnect trigger (reference connections/signals.py):
    ``trigger(reason)`` sets the latch, ``wait()`` blocks until
    triggered, returns the reason (MANUAL_TRIGGER when none was
    recorded) and clears the latch so sequential trigger/wait cycles
    compose; ``reset()`` clears both latch and reason."""

    def __init__(self) -> None:
        self.event = threading.Event()
        self.reason: str | None = None

    def trigger(self, reason: str) -> None:
        self.reason = reason
        self.event.set()

    def wait(self, timeout: float | None = None) -> str:
        if not self.event.wait(timeout):
            raise TimeoutError("reconnect signal not triggered")
        self.event.clear()
        reason = self.reason
        # consume the reason WITH the latch: a later bare event.set()
        # must report MANUAL_TRIGGER, not a stale prior reason
        self.reason = None
        return reason if reason is not None else MANUAL_TRIGGER

    def reset(self) -> None:
        self.event.clear()
        self.reason = None


def _upsert_envelopes(batch_df: DataFrame, sink_path: str, epoch_id: int) -> None:
    """Idempotent (channel, symbol, offset)-keyed merge into the sink:
    redelivered envelopes collapse to one row regardless of which
    connection attempt delivered them (the replay-absorb half of the
    ack contract; same keep-one shape as streaming/sinks.py K3)."""
    spark = batch_df.sparkSession
    incoming = batch_df.dropDuplicates(["channel", "symbol", "offset"])
    if os.path.exists(sink_path):
        existing = spark.read.parquet(sink_path)
        incoming = incoming.join(
            existing.select("channel", "symbol", "offset"),
            ["channel", "symbol", "offset"],
            "left_anti",
        )
        incoming.persist()
        try:
            if incoming.isEmpty():
                return
            incoming.write.mode("append").parquet(sink_path)
        finally:
            incoming.unpersist()
    else:
        incoming.write.mode("append").parquet(sink_path)


class FeedBusConnection:
    """One feed-bus 'connection': a streaming query writing envelopes
    to an idempotent offset-keyed sink, with the reference's
    drop/reconnect surface."""

    def __init__(
        self,
        spark: SparkSession,
        bus_path: str,
        sink_path: str,
        checkpoint: str,
        channels: list[str] | None = None,
        from_time: Any | None = None,
    ) -> None:
        self.spark = spark
        self.bus_path = bus_path
        self.sink_path = sink_path
        self.checkpoint = checkpoint
        self.channels = channels
        self.from_time = from_time
        self.state = DISCONNECTED
        self.last_error: str | None = None
        self.reconnect_signal = ReconnectSignal()
        self.query = None
        self._starting_offsets: str | dict[str, int] = "earliest"

    # -- lifecycle ----------------------------------------------------

    def connect(
        self, starting_offsets: str | dict[str, int] = "earliest"
    ) -> None:
        """Open the bus and start the live query (the session/channel
        handshake equivalent). ``starting_offsets`` is the
        re-subscription position (sources/feedbus.py contract)."""
        if self.query is not None:
            raise RuntimeError("already connected")
        # remember the subscription position: a checkpoint-resume
        # reconnect must rebuild the SAME plan (offset filter included)
        # or sub-position redeliveries arriving in new files would be
        # admitted past the original live-only/dict position.
        # "latest" is resolved to a concrete offset dict NOW — stored
        # verbatim it would re-resolve at reconnect time and silently
        # skip everything that arrived during the outage.
        if starting_offsets == "latest":
            starting_offsets = _latest_offsets(self.spark, self.bus_path)
        self._starting_offsets = starting_offsets
        stream = feed_bus_stream(
            self.spark,
            self.bus_path,
            channels=self.channels,
            starting_offsets=starting_offsets,
            from_time=self.from_time,
        )
        self.query = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", self.checkpoint)
            .foreachBatch(
                lambda df, epoch: _upsert_envelopes(df, self.sink_path, epoch)
            )
            .start()
        )
        self.state = CONNECTED

    def process_available(self) -> None:
        if self.query is None:
            raise RuntimeError("not connected")
        self.query.processAllAvailable()

    def inject_connection_dropped(self, reason: str = CONNECTION_DROPPED) -> None:
        """Failure injection (reference simulate_failure /
        inject_connection_dropped): record the reason, trigger the
        reconnect signal, and tear the query down."""
        self.last_error = reason
        self.state = ERROR
        self.reconnect_signal.trigger(reason)
        if self.query is not None:
            self.query.stop()
            self.query = None

    def _sink_offsets(self) -> dict[str, int]:
        """Recover per-channel positions from the sink (the reference's
        'last seen position' when no checkpoint survives)."""
        if not os.path.exists(self.sink_path):
            return {}
        rows = (
            self.spark.read.parquet(self.sink_path)
            .groupBy("channel")
            .agg(F.max("offset").alias("m"))
            .collect()
        )
        return {r["channel"]: r["m"] for r in rows}

    def reconnect(self, resume: str = "checkpoint") -> str:
        """Consume the pending reconnect signal and re-open the bus.

        resume="checkpoint": same checkpoint, exactly-once continuation.
        resume="sink": checkpoint lost — wipe it, recover positions from
        the sink's max offset per channel, re-subscribe strictly after
        them (redeliveries around the drop are absorbed by the
        idempotent sink). Returns the drop reason that was consumed."""
        reason = self.reconnect_signal.wait(timeout=0)
        if resume == "sink":
            import shutil

            if os.path.exists(self.checkpoint):
                shutil.rmtree(self.checkpoint)
            self.connect(starting_offsets=self._sink_offsets() or "earliest")
        elif resume == "checkpoint":
            self.connect(starting_offsets=self._starting_offsets)
        else:
            raise ValueError(f"unknown resume mode: {resume}")
        self.last_error = None
        return reason

    def close(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
        self.state = DISCONNECTED
