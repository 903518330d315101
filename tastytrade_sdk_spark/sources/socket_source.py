"""Live socket ingest speaking the DXLink frame protocol (SURVEY S1).

The reference's transport is a DXLink websocket (reference
src/tastytrade/connections/sockets.py:150-312): JSON text frames,
a SETUP / AUTH / CHANNEL_REQUEST / FEED_SETUP handshake with awaited
acks, FEED_SUBSCRIPTION add/remove (candle adds carry a ``fromTime``
backfill), a listener that demuxes frames by channel — FEED_DATA
routes to its channel's bounded queue, everything else to the control
queue 0 — and drops messages WITH A WARNING when a queue is full
(sockets.py:204-235). The sandbox has no ``websockets`` package and no
network, so the transport here is a stdlib TCP loopback carrying the
SAME JSON frames newline-delimited (the websocket text-frame payloads
without the ws framing layer); everything above the transport — frame
grammar, handshake order, channel demux, queue-full policy, COMPACT
payload shape — follows the reference protocol, so pointing the
client at a real DXLink endpoint needs only a ws transport shim.

Ingest path into Spark: the client drains its FEED_DATA queues into
the file-backend feed bus (sources/feedbus.py envelope schema) as
pyarrow parquet batches with per-channel monotonic offsets — so the
entire existing surface (feed_bus_stream offset resume, fromTime
filtering, subscription semi-joins, COMPACT decode, reconnection
workflow) runs unchanged on live-socket data. Offsets continue across
reconnects by scanning the bus's committed maxima, which is exactly
the ``resume="sink"`` contract in streaming/connection.py.

Channel numbering follows the reference (config/enumerations.py):
Control=0, Profile=1, Summary=3, Trade=5, Quote=7, Candle=9,
Greeks=11.
"""

from __future__ import annotations

import json
import logging
import queue
import socket
import threading
import time
from collections.abc import Mapping, Sequence
from datetime import datetime, timezone
from typing import Any

logger = logging.getLogger(__name__)

# reference config/enumerations.py Channels
CHANNELS = {
    "Control": 0,
    "Profile": 1,
    "Summary": 3,
    "Trade": 5,
    "Quote": 7,
    "Candle": 9,
    "Greeks": 11,
}
CHANNEL_NAMES = {v: k for k, v in CHANNELS.items()}

# COMPACT field lists per event type (the acceptEventFields the client
# offers in FEED_SETUP; reference config/configurations.py
# CHANNEL_SPECS -> EventTypes model fields). Field 0 is always the
# event symbol — the envelope's demux key.
DEFAULT_EVENT_FIELDS: dict[str, list[str]] = {
    "Trade": ["eventSymbol", "time", "price", "dayVolume", "size"],
    "Quote": [
        "eventSymbol", "time", "bidPrice", "askPrice", "bidSize", "askSize",
    ],
    "Candle": [
        "eventSymbol", "time", "eventFlags", "open", "high", "low",
        "close", "volume",
    ],
    "Greeks": [
        "eventSymbol", "time", "volatility", "delta", "gamma", "theta",
        "rho", "vega",
    ],
    "Profile": ["eventSymbol", "description"],
    "Summary": [
        "eventSymbol", "openInterest", "dayOpenPrice", "dayHighPrice",
        "dayLowPrice", "prevDayClosePrice",
    ],
}


def _send_frame(sock: socket.socket, msg: Mapping[str, Any]) -> None:
    sock.sendall((json.dumps(dict(msg)) + "\n").encode("utf-8"))


class _LineReader:
    """Newline-delimited frame reader over a blocking socket."""

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.buf = b""

    def readline(self) -> bytes | None:
        while b"\n" not in self.buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                return None
            self.buf += chunk
        line, self.buf = self.buf.split(b"\n", 1)
        return line


class LoopbackFeedServer:
    """DXLink-protocol test double on a loopback TCP port.

    Serves the server half of the reference handshake — SETUP ack,
    AUTH_STATE AUTHORIZED (any non-empty token; empty token =
    UNAUTHORIZED, connection refused), CHANNEL_OPENED per
    CHANNEL_REQUEST, FEED_CONFIG per FEED_SETUP — then answers
    FEED_SUBSCRIPTION by replaying its scripted events for subscribed
    symbols as COMPACT FEED_DATA frames. Candle subscriptions with
    ``fromTime`` replay the backfill snapshot (events at/after
    fromTime) before live events, per sockets.py:452-531 semantics.

    ``script`` rows: (channel_name, event_type, fields list) where
    fields[0] is the symbol and, for Candle, fields[1] is epoch-ms
    event time (used for the fromTime cut).

    ``inject_drop()`` severs live client connections mid-stream — the
    reference's simulate_failure hook — so reconnection tests can
    drive the drop/reconnect/resume loop over a real socket.

    ``batch=True`` coalesces a replay's events per (channel, type)
    into ONE FEED_DATA frame whose flat array carries N back-to-back
    events — the reference feed's actual COMPACT framing
    (handlers.py:156-203 chunks by field count); the client and
    decode_compact must handle it without per-event frames.
    """

    def __init__(
        self,
        script: Sequence[tuple[str, str, list[Any]]],
        live_script: Sequence[tuple[str, str, list[Any]]] = (),
        batch: bool = False,
    ) -> None:
        self.script = list(script)
        self.live_script = list(live_script)
        self.batch = batch
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self._conns: list[socket.socket] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            with self._lock:
                self._conns.append(conn)
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        reader = _LineReader(conn)
        subscribed: dict[int, set[str]] = {}
        sent_live = False
        try:
            while True:
                line = reader.readline()
                if line is None:
                    return
                try:
                    msg = json.loads(line)
                except json.JSONDecodeError:
                    continue
                mtype = msg.get("type")
                if mtype == "SETUP":
                    _send_frame(conn, {
                        "type": "SETUP", "channel": 0,
                        "version": msg.get("version", ""),
                        "keepaliveTimeout": 60,
                    })
                elif mtype == "AUTH":
                    state = (
                        "AUTHORIZED" if msg.get("token") else "UNAUTHORIZED"
                    )
                    _send_frame(conn, {
                        "type": "AUTH_STATE", "channel": 0, "state": state,
                    })
                    if state != "AUTHORIZED":
                        return
                elif mtype == "CHANNEL_REQUEST":
                    _send_frame(conn, {
                        "type": "CHANNEL_OPENED",
                        "channel": msg["channel"],
                        "service": "FEED",
                    })
                elif mtype == "FEED_SETUP":
                    _send_frame(conn, {
                        "type": "FEED_CONFIG",
                        "channel": msg["channel"],
                        "dataFormat": msg.get("acceptDataFormat", "COMPACT"),
                    })
                elif mtype == "FEED_SUBSCRIPTION":
                    ch = msg["channel"]
                    subs = subscribed.setdefault(ch, set())
                    if msg.get("reset"):
                        subs.clear()
                    from_times: dict[str, int] = {}
                    for item in msg.get("add") or []:
                        subs.add(item["symbol"])
                        if item.get("fromTime") is not None:
                            from_times[item["symbol"]] = item["fromTime"]
                    for item in msg.get("remove") or []:
                        subs.discard(item["symbol"])
                    self._replay(conn, ch, subs, from_times)
                    if not sent_live:
                        sent_live = True
                        self._replay_live(conn, subscribed)
                elif mtype == "KEEPALIVE":
                    _send_frame(conn, {"type": "KEEPALIVE", "channel": 0})
        except OSError:
            return
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _replay(
        self,
        conn: socket.socket,
        channel: int,
        subs: set[str],
        from_times: dict[str, int],
    ) -> None:
        """Scripted snapshot for one channel's current symbol set —
        candle fromTime cuts rows strictly before the requested
        backfill start (the reference's snapshot-then-live replay).
        With ``batch=True``, all surviving events of one type go out
        as ONE FEED_DATA frame with a back-to-back flat array."""
        per_type: dict[str, list[Any]] = {}
        for ch_name, etype, fields in self.script:
            if CHANNELS[ch_name] != channel or fields[0] not in subs:
                continue
            ft = from_times.get(fields[0])
            if ft is not None and etype == "Candle" and fields[1] < ft:
                continue
            if self.batch:
                per_type.setdefault(etype, []).extend(fields)
            else:
                _send_frame(conn, {
                    "type": "FEED_DATA", "channel": channel,
                    "data": [etype, list(fields)],
                })
        for etype, flat in per_type.items():
            _send_frame(conn, {
                "type": "FEED_DATA", "channel": channel,
                "data": [etype, flat],
            })

    def _replay_live(
        self, conn: socket.socket, subscribed: dict[int, set[str]]
    ) -> None:
        for ch_name, etype, fields in self.live_script:
            ch = CHANNELS[ch_name]
            if fields[0] not in subscribed.get(ch, set()):
                continue
            _send_frame(conn, {
                "type": "FEED_DATA", "channel": ch,
                "data": [etype, list(fields)],
            })

    def inject_drop(self) -> None:
        with self._lock:
            conns, self._conns = self._conns, []
        for c in conns:
            try:
                c.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                c.close()
            except OSError:
                pass

    def close(self) -> None:
        self._stop.set()
        try:
            self.srv.close()
        except OSError:
            pass
        self.inject_drop()


class DXLinkSocketClient:
    """Client half of the DXLink protocol over a stdlib socket,
    draining FEED_DATA into the file-backend feed bus.

    Mirrors the reference connection lifecycle (sockets.py:150-312):
    ``connect()`` performs SETUP -> await SETUP ack -> AUTH -> await
    AUTH_STATE AUTHORIZED -> CHANNEL_REQUEST per channel -> await the
    CHANNEL_OPENED acks -> FEED_SETUP per channel, then ``subscribe``
    sends FEED_SUBSCRIPTION add/remove (candle adds carry fromTime).
    The listener thread routes each frame by ``channel if type ==
    'FEED_DATA' else 0`` into that channel's BOUNDED queue and drops
    with a warning on overflow — the reference's QueueFull policy
    (sockets.py:204-235) — counting drops per channel in
    ``dropped_counts`` so backpressure is observable.

    ``drain_to_bus()`` flushes queued FEED_DATA frames as one parquet
    envelope batch: (channel=name, symbol=fields[0], offset=per-channel
    monotonic, ts=ingest time, payload=JSON COMPACT array). Offsets
    resume past the bus's committed maxima on (re)connect, so a
    reconnect after a drop continues the log instead of restarting it
    (streaming/connection.py resume="sink" contract).
    """

    def __init__(
        self,
        host: str,
        port: int,
        token: str,
        bus_path: str,
        channels: Sequence[str] = ("Trade", "Quote", "Candle", "Greeks"),
        queue_maxsize: int = 1024,
        event_fields: Mapping[str, list[str]] | None = None,
    ) -> None:
        self.host, self.port, self.token = host, port, token
        self.bus_path = bus_path
        self.channels = list(channels)
        self.queue_maxsize = queue_maxsize
        self.event_fields = dict(event_fields or DEFAULT_EVENT_FIELDS)
        self.queues: dict[int, queue.Queue] = {}
        self.dropped_counts: dict[int, int] = {}
        self.control_acks: list[dict[str, Any]] = []
        self.connection_dropped = threading.Event()
        self._offsets: dict[str, int] = {}
        self._sock: socket.socket | None = None
        self._listener: threading.Thread | None = None
        self._acks = {
            "setup": threading.Event(),
            "authorized": threading.Event(),
        }
        self._channel_opened: dict[int, threading.Event] = {}

    # -- connection lifecycle -------------------------------------------------

    def connect(self, timeout: float = 5.0) -> None:
        # reconnect without leaking a prior socket; wait for the old
        # listener to exit so its drop-latch set() can't race the
        # clear() below onto the fresh connection
        self.close()
        if self._listener is not None and self._listener.is_alive():
            self._listener.join(timeout=2.0)
        self.connection_dropped.clear()
        self._acks["setup"].clear()
        self._acks["authorized"].clear()
        self._channel_opened = {
            CHANNELS[c]: threading.Event() for c in self.channels
        }
        self.queues = {0: queue.Queue(maxsize=self.queue_maxsize)}
        for c in self.channels:
            self.queues[CHANNELS[c]] = queue.Queue(
                maxsize=self.queue_maxsize
            )
            self.dropped_counts.setdefault(CHANNELS[c], 0)
        # resume offsets past the bus's committed maxima (reconnects
        # continue the per-channel log — the resume="sink" position)
        self._offsets = _bus_max_offsets(self.bus_path)
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=timeout
        )
        self._sock.settimeout(timeout)
        self._listener = threading.Thread(
            target=self._listen, name="dxlink_listener", daemon=True
        )
        self._listener.start()
        # handshake in the reference's order, each step awaiting its ack
        _send_frame(self._sock, {
            "type": "SETUP", "channel": 0, "version": "0.1-DXF-JS/0.3.0",
            "keepaliveTimeout": 60, "acceptKeepaliveTimeout": 60,
        })
        self._await(self._acks["setup"], timeout, "SETUP ack")
        _send_frame(self._sock, {
            "type": "AUTH", "channel": 0, "token": self.token,
        })
        self._await(self._acks["authorized"], timeout, "AUTH_STATE")
        # fan out all CHANNEL_REQUESTs, then gather the acks (the
        # reference sends-then-waits the same way, sockets.py:265-282)
        for c in self.channels:
            _send_frame(self._sock, {
                "type": "CHANNEL_REQUEST", "service": "FEED",
                "channel": CHANNELS[c], "parameters": {"contract": "AUTO"},
            })
        for c in self.channels:
            self._await(
                self._channel_opened[CHANNELS[c]], timeout,
                f"CHANNEL_OPENED {c}",
            )
        for c in self.channels:
            _send_frame(self._sock, {
                "type": "FEED_SETUP", "channel": CHANNELS[c],
                "acceptAggregationPeriod": 0.1,
                "acceptDataFormat": "COMPACT",
                "acceptEventFields": {c: self.event_fields[c]},
            })

    @staticmethod
    def _await(event: threading.Event, timeout: float, what: str) -> None:
        if not event.wait(timeout):
            raise TimeoutError(f"DXLink handshake: no {what}")

    def subscribe(
        self,
        channel: str,
        add: Sequence[str | Mapping[str, Any]] = (),
        remove: Sequence[str] = (),
        reset: bool = False,
    ) -> None:
        """FEED_SUBSCRIPTION: ``add`` items are symbols or mappings
        with symbol/fromTime/toTime (candle backfill)."""
        assert self._sock is not None, "connect() first"
        add_items = []
        for item in add:
            if isinstance(item, str):
                add_items.append({"type": channel, "symbol": item})
            else:
                add_items.append({"type": channel, **dict(item)})
        _send_frame(self._sock, {
            "type": "FEED_SUBSCRIPTION", "channel": CHANNELS[channel],
            "reset": reset,
            "add": add_items,
            "remove": [
                {"type": channel, "symbol": s} for s in remove
            ],
        })

    def _listen(self) -> None:
        assert self._sock is not None
        reader = _LineReader(self._sock)
        try:
            while True:
                try:
                    line = reader.readline()
                except (TimeoutError, socket.timeout):
                    # recv timeout is a liveness poll, not a drop: an
                    # idle but healthy connection (no keepalives in the
                    # test double) must not trip the drop latch
                    continue
                if line is None:
                    break
                try:
                    msg = json.loads(line)
                except json.JSONDecodeError as e:
                    logger.error("Failed to parse message: %s\n%s", e, line)
                    continue
                mtype = msg.get("type")
                # the reference's demux line (sockets.py:211-217):
                # FEED_DATA routes by its channel, all else to control
                channel = msg.get("channel", 0) if mtype == "FEED_DATA" else 0
                if channel == 0:
                    self._handle_control(msg)
                q = self.queues.get(channel)
                if q is None:
                    continue
                try:
                    q.put_nowait(msg)
                except queue.Full:
                    logger.warning(
                        "Queue %d is full - dropping message", channel
                    )
                    self.dropped_counts[channel] = (
                        self.dropped_counts.get(channel, 0) + 1
                    )
        except OSError:
            pass
        # socket closed or errored: the reference raises
        # ReconnectSignal(CONNECTION_DROPPED) here
        self.connection_dropped.set()

    def _handle_control(self, msg: Mapping[str, Any]) -> None:
        self.control_acks.append(dict(msg))
        mtype = msg.get("type")
        if mtype == "SETUP":
            self._acks["setup"].set()
        elif mtype == "AUTH_STATE" and msg.get("state") == "AUTHORIZED":
            self._acks["authorized"].set()
        elif mtype == "CHANNEL_OPENED":
            ev = self._channel_opened.get(msg.get("channel"))
            if ev is not None:
                ev.set()

    # -- bus drain ------------------------------------------------------------

    def drain_to_bus(
        self,
        min_events: int = 0,
        timeout: float = 5.0,
    ) -> int:
        """Flush queued FEED_DATA into one envelope parquet batch;
        returns the number of envelopes written. Blocks until at least
        ``min_events`` frames are available (or timeout)."""
        deadline = time.monotonic() + timeout
        rows: list[tuple[str, str, int, datetime, str]] = []
        while True:
            for ch_num, q in self.queues.items():
                if ch_num == 0:
                    continue
                while True:
                    try:
                        msg = q.get_nowait()
                    except queue.Empty:
                        break
                    etype, flat = msg["data"][0], msg["data"][1]
                    name = CHANNEL_NAMES.get(ch_num, str(ch_num))
                    # the server batches per (channel, type) across ALL
                    # subscribed symbols, so one FEED_DATA frame can
                    # carry several events back-to-back; writing the
                    # whole frame as one envelope stamped with flat[0]
                    # misattributes every other event's symbol (the
                    # feedbus symbol semi-join and the
                    # (channel, symbol, offset) exactly-once key both
                    # key on it — r9 advisor). Split by the type's
                    # field count into ONE ENVELOPE PER EVENT; a
                    # trailing partial chunk still ships (decode_compact
                    # routes it to the corrupt column downstream), and
                    # an UNKNOWN type (no field list — nothing to chunk
                    # by) ships unsplit with symbol NULL so nothing is
                    # ever misattributed. NOTE the downstream contract
                    # (r10 advisor): a NULL symbol matches NO
                    # subscription — feedbus.subscribed's
                    # left-semi join drops these envelopes, which is
                    # the intended semantics (an unattributable event
                    # cannot belong to any symbol subscription). The
                    # audit path for unknown types is the RAW bus
                    # (pre-filter), where decode_compact routes them
                    # to the corrupt column; pinned by
                    # tests/test_feedbus.py::
                    # test_unknown_type_null_symbol_contract.
                    nf = len(self.event_fields.get(etype, ()))
                    if nf > 0:
                        chunks = [
                            flat[i : i + nf] for i in range(0, len(flat), nf)
                        ] or [[]]
                    else:
                        chunks = [flat]
                    for chunk in chunks:
                        off = self._offsets.get(name, -1) + 1
                        self._offsets[name] = off
                        # payload = the COMPACT contract downstream of
                        # the transport: a FLAT string array,
                        # [eventType, field0, field1, ...] —
                        # decode_compact's input shape (S2), with the
                        # event type at position 1 for channel-vs-type
                        # audits
                        rows.append((
                            name,
                            (str(chunk[0]) if chunk else "")
                            if nf > 0
                            else None,
                            off,
                            datetime.now(timezone.utc),
                            json.dumps(
                                [etype, *[
                                    "" if x is None else str(x)
                                    for x in chunk
                                ]]
                            ),
                        ))
            if len(rows) >= min_events or time.monotonic() >= deadline:
                break
            time.sleep(0.02)
        if rows:
            _write_envelopes(self.bus_path, rows)
        return len(rows)

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None


def _bus_max_offsets(bus_path: str) -> dict[str, int]:
    """Committed max offset per channel in a file-backend bus (pyarrow
    read — the ingest side must not need a SparkSession)."""
    import pyarrow.dataset as ds

    try:
        table = ds.dataset(bus_path, format="parquet").to_table(
            columns=["channel", "offset"]
        )
    except Exception:
        return {}
    out: dict[str, int] = {}
    for ch, off in zip(
        table.column("channel").to_pylist(),
        table.column("offset").to_pylist(),
    ):
        if off is not None and off > out.get(ch, -1):
            out[ch] = off
    return out


def _write_envelopes(
    bus_path: str, rows: list[tuple[str, str, int, datetime, str]]
) -> None:
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(bus_path, exist_ok=True)
    table = pa.table({
        "channel": pa.array([r[0] for r in rows], pa.string()),
        "symbol": pa.array([r[1] for r in rows], pa.string()),
        "offset": pa.array([r[2] for r in rows], pa.int64()),
        # Spark's parquet reader expects TIMESTAMP without tz metadata
        # to be session-local; write tz-naive UTC micros to match the
        # envelope schema's bare `timestamp`
        "ts": pa.array(
            [r[3].replace(tzinfo=None) for r in rows],
            pa.timestamp("us"),
        ),
        "payload": pa.array([r[4] for r in rows], pa.string()),
    })
    pq.write_table(
        table, os.path.join(bus_path, f"batch-{uuid.uuid4().hex}.parquet")
    )
