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

Word timestamps run in multihost mode too, with one restructuring: the
single-host scheduler dispatches the align program from its *assemble
pool* thread, concurrently with the lockstep loop — a second,
non-deterministically interleaved op stream that would desync the
replay. In multihost mode the scheduler instead dispatches align from
the WORKER thread at harvest (`ContinuousEngine.align_fetch`, published
here as the "align" op — a deterministic position in the stream) and
hands only the pure-host DTW half to the assemble pool. Cost: the
worker loop absorbs one align dispatch per word-ts harvest.

Trust model: the op channel carries pickled numpy/scalar payloads
between the pod's own hosts. Because unpickling attacker bytes is
arbitrary code execution, the channel is authenticated BEFORE any
pickle flows: each side must present an HMAC-SHA256 digest keyed by the
shared secret (WL_OPS_SECRET, same env contract as WL_COORDINATOR) —
the leader rejects unauthenticated followers (a squatter can neither
occupy a follower slot nor receive the op stream), and a follower
refuses a leader that cannot prove the key (a squatted port cannot feed
it pickles). The digests are fixed-length raw bytes, so nothing is
unpickled pre-auth. Still bind the leader port on the pod-internal
interface (run_server derives the default from WL_COORDINATOR), never
a public one: the secret gates access, the bind bounds exposure.

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

import hashlib
import hmac
import logging
import os
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

# --- channel authentication (pre-pickle, fixed-length raw bytes) -------

_AUTH_LEN = hashlib.sha256().digest_size


def ops_secret() -> bytes:
    """Shared op-channel secret (WL_OPS_SECRET on every host). An empty
    secret still runs the handshake (the digests must match) but provides
    no protection against an attacker who knows the protocol — warn."""
    secret = os.environ.get("WL_OPS_SECRET", "")
    if not secret:
        logger.warning(
            "WL_OPS_SECRET is not set: the multi-host op channel is "
            "unauthenticated — anyone reaching the leader port can join "
            "as a follower (receiving all session audio) or squat the "
            "port and feed followers pickles. Set the same secret on "
            "every host."
        )
    return secret.encode()


def _auth_digest(secret: bytes, role: str) -> bytes:
    return hmac.new(secret, f"wl-ops-{role}-v1".encode(), hashlib.sha256).digest()


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("op-log peer closed during auth")
        buf.extend(chunk)
    return bytes(buf)


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
        secret: Optional[bytes] = None,
    ):
        if secret is None:
            secret = ops_secret()
        self._srv = socket.create_server((host, port), backlog=max(n_followers, 1))
        self._srv.settimeout(accept_timeout_s)
        self.conns: list[socket.socket] = []
        deadline = time.monotonic() + accept_timeout_s
        want = _auth_digest(secret, "follower")
        reply = _auth_digest(secret, "leader")
        while len(self.conns) < n_followers:
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"only {len(self.conns)}/{n_followers} followers "
                    "authenticated before the accept deadline"
                )
            conn, addr = self._srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            # Auth BEFORE the connection occupies a follower slot: the
            # peer must present the follower digest within a short
            # window, or a port-scanner/squatter would both stall the
            # real follower and receive every session's raw audio.
            try:
                conn.settimeout(10.0)
                got = _recv_exact(conn, _AUTH_LEN)
                if not hmac.compare_digest(got, want):
                    raise ConnectionError("bad follower auth digest")
                conn.sendall(reply)  # prove the leader knows the key too
                conn.settimeout(None)
            except (OSError, ConnectionError) as e:
                logger.warning(
                    "rejecting unauthenticated op-log connection from "
                    "%s: %s", addr, e,
                )
                conn.close()
                continue
            self.conns.append(conn)
            logger.info("op-log follower authenticated from %s", addr)

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

    def __init__(
        self,
        addr: tuple[str, int],
        connect_timeout_s: float = 120.0,
        secret: Optional[bytes] = None,
    ):
        if secret is None:
            secret = ops_secret()
        deadline = time.monotonic() + connect_timeout_s
        while True:
            try:
                self._sock = socket.create_connection(addr, timeout=10.0)
                # Mutual auth before ANY pickle is read: present the
                # follower digest, then require the leader digest back —
                # a squatter on the leader port cannot produce it, so it
                # can never feed this process attacker-controlled
                # pickles (pickle.loads is code execution). A rejection
                # (leader closed / wrong digest) retries like a refused
                # connect: the real leader may simply not be up yet.
                self._sock.settimeout(10.0)
                self._sock.sendall(_auth_digest(secret, "follower"))
                got = _recv_exact(self._sock, _AUTH_LEN)
                if not hmac.compare_digest(got, _auth_digest(secret, "leader")):
                    raise ConnectionError("op-log leader failed auth")
                break
            except (OSError, ConnectionError):
                try:
                    self._sock.close()
                except Exception:
                    pass
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


def params_fingerprint(params, mesh) -> tuple:
    """Cheap cross-host weight fingerprint: float32 sums of a few leaves,
    computed by ONE replicated SPMD program (an all-reduce every process
    dispatches at engine construction, before any op-log traffic — so the
    replay streams stay aligned) and therefore bit-identical on every
    host iff the weights are. Catches the silent-wrong-tokens failure of
    a follower launched with a different checkpoint or seed: slot state
    is sharded over hosts, so a mismatched follower's shards would flow
    into the leader's all-gathered results undetected."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves_with_path(params)
    leaves.sort(key=lambda kv: jax.tree_util.keystr(kv[0]))
    picks = [leaves[0], leaves[len(leaves) // 2], leaves[-1]]

    fn = jax.jit(
        lambda xs: [jnp.sum(x.astype(jnp.float32)) for x in xs],
        out_shardings=NamedSharding(mesh, P()),
    )
    vals = fn([x for _, x in picks])
    return tuple(
        (jax.tree_util.keystr(k), float(v)) for (k, _), v in zip(picks, vals)
    )


def engine_signature(cb: ContinuousEngine) -> dict:
    """Everything that must match for two processes' engines to trace
    identical programs from identical op payloads — geometry, quantization
    flags, AND a weight fingerprint (identical host bytes through identical
    programs still serve garbage if the params differ)."""
    sh = cb.shardings
    return {
        "params_fp": getattr(cb, "_params_fp", None),
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
        # weight fingerprint for the signature handshake — EVERY process
        # computes it here (same collective, same construction-time point
        # in its op stream), leader and follower alike
        self._params_fp = params_fingerprint(self.eng.params, self.shardings.mesh)
        if self.draft is not None:
            self._params_fp = self._params_fp + params_fingerprint(
                self.draft.params, self.shardings.mesh
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

    def align_fetch(self, slot, tokens_arr, cross_len):
        # word-ts alignment: dispatched from the scheduler's WORKER thread
        # at harvest (deterministic op-stream position — the assemble pool
        # only gets the pure-host DTW half), so publishing here keeps
        # every process's program order identical. The base class fetches
        # through self._fetch, which replicates sharded outputs on every
        # host alike.
        self._pub("align", (slot, np.asarray(tokens_arr), int(cross_len)))
        return super().align_fetch(slot, tokens_arr, cross_len)

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
        # Error parity with the leader: the leader's scheduler catches op
        # exceptions and keeps serving (_do_inserts logs-and-fails the
        # requests; the worker-loop catch-all releases slots — both
        # recovery paths publish their own device ops, which arrive next
        # on this stream). A deterministic op failure therefore raises
        # HERE too and must be survived the same way, or this process
        # dies and the leader's next collective hangs the whole mesh.
        try:
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
            elif op == "align":
                engine.align_fetch(*payload)
            else:
                # NOT recoverable: an unknown opcode means a protocol
                # mismatch — continuing would replay a desynced stream
                raise RuntimeError(f"unknown op-log opcode {op!r}")
        except Exception:
            if op not in (
                "init_state", "insert", "step", "release",
                "harvest_all", "harvest", "align",
            ):
                raise
            logger.exception(
                "op-log replay of %r failed (continuing — the leader's "
                "scheduler survives the same failure)", op,
            )
