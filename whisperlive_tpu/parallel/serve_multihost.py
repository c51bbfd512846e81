"""Multi-host SERVING of one sliced continuous engine: SPMD op replay.

Multi-host training (parallel/multihost.py) is easy to keep SPMD — every
host computes the same step from the same replicated batch metadata. A
SERVER is not: exactly one host holds the websocket connections, the
session state, and the scheduler's (data-dependent!) decisions about
which request lands in which slot at which tick. Yet a jitted program
over a multi-process mesh only runs if EVERY process dispatches the same
program with the same shapes in the same order — XLA's collectives
rendezvous by program order, not by tags.

This module squares that circle with an op log. The LEADER (process 0)
runs the real server + `ContinuousScheduler`; every device op the
scheduler performs on the slot engine — init_state / insert / step /
release / harvest — is published over a TCP byte stream to every
FOLLOWER process *before* the leader dispatches it. Followers run
`run_follower`, a loop that deserializes each op and replays it on
their own (identically-constructed) engine. Host-side argument bytes
are identical, so every process traces/compiles/dispatches identical
programs in identical order: the SPMD contract holds even though only
the leader knows *why* any op happened. The scheduler itself needs no
distributed logic — its engine just happens to broadcast.

Device->host reads need one extra rule. Slot state is sharded over the
mesh's "data" axis, which spans hosts; the leader cannot fetch a
cross-host shard locally. `MultihostContinuousEngine._fetch` reshards
the value to fully-replicated first — an all-gather every process
executes at the same replayed point — after which each host reads its
local copy (followers discard theirs). State fields that are already
replicated (the packed `status` plane) skip the collective on every
host alike, keeping the op streams aligned.

What does NOT run in multihost mode: the word-timestamps cross-KV
slice and its align program. They run on the scheduler's *assemble
pool* thread, concurrently with the lockstep loop — a second,
non-deterministically interleaved op stream that would desync the
replay. `ContinuousScheduler` gates them on `engine.multihost` and
serves such requests without word timings (assemble_result degrades
gracefully). Sessions needing word timestamps belong on a single-host
replica behind the cluster router (serving/cluster.py).

Trust model: the op channel carries pickled numpy/scalar payloads
between the pod's own hosts — the same trust domain as jax.distributed
itself (whose control channel is equally unauthenticated). Bind the
leader port on the pod-internal interface, never a public one.

Reference: collabora/WhisperLive has no multi-host serving (SURVEY §5 —
TRT-LLM pinned to world_size=1); this subsystem is TPU-native headroom:
one logical engine over N hosts' chips, dp x tp over the global mesh.

Usage (same script on every host; see tests/serve_multihost_worker.py):

    multihost.init_multihost()
    sh = multihost.multihost_shardings(tp=4)
    eng = WhisperEngine(cfg, params, shardings=sh)
    if multihost.is_primary():
        leader = OpLeader(port, n_followers=jax.process_count() - 1)
        cb = MultihostContinuousEngine(eng, leader=leader, n_slots=16)
        sched = ContinuousScheduler(eng, cb=cb)
        sched.start(); ... serve ...; sched.stop()
        cb.stop_followers()
    else:
        cb = MultihostContinuousEngine(eng, n_slots=16)
        run_follower(cb, OpFollower(("leader-host", port)))
"""

from __future__ import annotations

import logging
import pickle
import socket
import struct
import time
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from whisperlive_tpu.engine.continuous import ContinuousEngine

logger = logging.getLogger(__name__)

_HDR = struct.Struct("<I")  # frame = u32 length + pickle payload


class OpLeader:
    """Leader side of the op log: accepts follower connections, then
    broadcasts each (op, payload) frame to all of them in call order.
    TCP preserves per-connection ordering, which is the only ordering
    the replay needs."""

    def __init__(
        self,
        port: int,
        n_followers: int,
        host: str = "127.0.0.1",
        accept_timeout_s: float = 120.0,
    ):
        self._srv = socket.create_server((host, port), backlog=max(n_followers, 1))
        self._srv.settimeout(accept_timeout_s)
        self.conns: list[socket.socket] = []
        for _ in range(n_followers):
            conn, addr = self._srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.conns.append(conn)
            logger.info("op-log follower connected from %s", addr)

    def publish(self, op: str, payload=None) -> None:
        frame = pickle.dumps((op, payload), protocol=pickle.HIGHEST_PROTOCOL)
        msg = _HDR.pack(len(frame)) + frame
        for conn in self.conns:
            conn.sendall(msg)

    def close(self) -> None:
        for conn in self.conns:
            try:
                conn.close()
            except OSError:
                pass
        self._srv.close()


class OpFollower:
    """Follower side: connects (with retry — the leader may bind late)
    and yields ops in publication order."""

    def __init__(self, addr: tuple[str, int], connect_timeout_s: float = 120.0):
        deadline = time.monotonic() + connect_timeout_s
        while True:
            try:
                self._sock = socket.create_connection(addr, timeout=10.0)
                break
            except OSError:
                if time.monotonic() >= deadline:
                    raise
                time.sleep(0.2)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock.settimeout(None)  # ops arrive whenever the leader acts

    def _read_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("op-log leader closed the channel")
            buf.extend(chunk)
        return bytes(buf)

    def next(self) -> tuple[str, object]:
        (length,) = _HDR.unpack(self._read_exact(_HDR.size))
        return pickle.loads(self._read_exact(length))

    def close(self) -> None:
        self._sock.close()


def engine_signature(cb: ContinuousEngine) -> dict:
    """Everything that must match for two processes' engines to trace
    identical programs from identical op payloads."""
    sh = cb.shardings
    return {
        "n_slots": cb.n_slots,
        "prompt_pad": cb.prompt_pad,
        "ring": cb.ring,
        "steps_per_chunk": cb.steps_per_chunk,
        "beam_width": cb.beam_width,
        "spec_k": cb.spec_k,
        "enc_buckets": tuple(cb.enc_buckets),
        "cross_ctx": cb.cross_ctx,
        "cache_len": cb.cache_len,
        "dp_sharded": cb.dp_sharded,
        "dp": sh.dp if sh is not None else 1,
        "tp": sh.tp if sh is not None else 1,
        "cross_kv_bits": cb.eng.cross_kv_bits,
        "decoder_int8": cb.eng.decoder_int8,
        "n_vocab": cb.eng.cfg.n_vocab,
        "n_audio_ctx": cb.eng.cfg.n_audio_ctx,
        "n_text_layer": cb.eng.cfg.n_text_layer,
    }


class MultihostContinuousEngine(ContinuousEngine):
    """ContinuousEngine whose device ops broadcast to follower processes.

    Construct identically on every host (same WhisperEngine params /
    seeds / pool geometry — `engine_signature` is handshake-checked).
    On the leader pass `leader=OpLeader(...)`; followers pass nothing
    and replay via `run_follower`. `multihost=True` additionally gates
    the scheduler's assemble-thread device ops (see module docstring).
    """

    multihost = True

    def __init__(self, *args, leader: Optional[OpLeader] = None, **kwargs):
        self._leader = None  # _pub inert while the base class constructs
        super().__init__(*args, **kwargs)
        if self.shardings is None:
            raise ValueError(
                "multihost serving needs a sharded engine "
                "(WhisperEngine(..., shardings=multihost_shardings(...)))"
            )
        # reshard-to-replicated for cross-host state reads; jit caches
        # one executable per (shape, dtype, sharding) encountered
        self._replicate_fn = jax.jit(
            lambda x: x,
            out_shardings=NamedSharding(self.shardings.mesh, P()),
        )
        self._leader = leader
        if leader is not None:
            leader.publish("hello", engine_signature(self))

    # -- publication ---------------------------------------------------

    def _pub(self, op: str, payload=None) -> None:
        if self._leader is not None:
            self._leader.publish(op, payload)

    def stop_followers(self) -> None:
        """End every follower's replay loop and close the channel."""
        if self._leader is not None:
            self._leader.publish("stop")
            self._leader.close()
            self._leader = None

    # -- device-op surface (publish, then run the shared implementation)

    def _fetch(self, x, dtype=None) -> np.ndarray:
        # Branching must be bit-identical across processes: the sharding
        # of a given state field is a compile-time fact of the shared
        # SPMD program, so is_fully_replicated agrees on every host.
        if not x.is_fully_replicated:
            x = self._replicate_fn(x)  # all-gather on EVERY process
        return np.asarray(x, dtype)

    def _stage(self, x, dtype=None):
        # jit args must be global arrays: every process holds the same
        # host bytes (shipped over the op log), so a replicated
        # device_put over the global mesh is exact and copy-cheap.
        arr = np.asarray(x, dtype) if dtype is not None else np.asarray(x)
        return jax.device_put(
            arr, NamedSharding(self.shardings.mesh, P())
        )

    def init_state(self, seed: int = 0) -> None:
        self._pub("init_state", seed)
        super().init_state(seed)

    def insert(self, *args, **kwargs):
        self._pub("insert", (args, kwargs))
        return super().insert(*args, **kwargs)

    def step(self) -> np.ndarray:
        self._pub("step")
        return super().step()

    def release(self, slot_ids: list[int]) -> None:
        self._pub("release", list(slot_ids))
        super().release(slot_ids)

    def harvest_all(self) -> np.ndarray:
        self._pub("harvest_all")
        return super().harvest_all()

    def harvest(
        self, slot: int, join_step: int, gen_len: int, lane: int = 0
    ) -> np.ndarray:
        # The base class reads ONE state row, which may live on another
        # host; fetch the full (replicated) plane instead. Costs an
        # all-gather — serving uses the packed status rows from step()
        # and never calls this on the hot path.
        self._pub("harvest", (slot, join_step, gen_len, lane))
        row_i = slot * self.beam_width + lane
        row = self._fetch(self.state["sampled"], np.int32)[row_i]
        if self.spec_k:
            valid = self._fetch(self.state["tok_valid"])[row_i]
            return self.unroll_masked(row, valid, join_step, self.ring)
        return self.unroll(row, join_step, gen_len, self.ring)


def run_follower(
    engine: MultihostContinuousEngine, chan: OpFollower
) -> int:
    """Replay the leader's op stream on this process's engine. Blocks
    until the leader publishes "stop" (returns the op count) or the
    channel breaks (raises). The engine must be constructed exactly as
    the leader's — the first frame is a signature handshake."""
    op, sig = chan.next()
    if op != "hello":
        raise RuntimeError(f"op-log stream must start with hello, got {op!r}")
    mine = engine_signature(engine)
    if sig != mine:
        diff = {
            k: (sig.get(k), mine.get(k))
            for k in set(sig) | set(mine)
            if sig.get(k) != mine.get(k)
        }
        raise RuntimeError(f"engine signature mismatch with leader: {diff}")
    n = 0
    while True:
        op, payload = chan.next()
        n += 1
        if op == "stop":
            logger.info("op-log follower replayed %d ops", n - 1)
            return n - 1
        if op == "init_state":
            engine.init_state(payload)
        elif op == "insert":
            args, kwargs = payload
            engine.insert(*args, **kwargs)
        elif op == "step":
            engine.step()
        elif op == "release":
            engine.release(payload)
        elif op == "harvest_all":
            engine.harvest_all()
        elif op == "harvest":
            engine.harvest(*payload)
        else:
            raise RuntimeError(f"unknown op-log opcode {op!r}")
