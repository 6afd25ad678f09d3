"""Continuous-batching serving engine over the exact overlap-save decoder.

The fleet decoders (`fir_generate_batch`, `overlap_save_generate_batch`)
serve a FIXED batch of N streams that start and stop together.  A serving
deployment gets a QUEUE: requests arrive over time, finish at different
lengths, and the batch slot a request occupied should immediately serve
the next one.  The reference has no counterpart (its recommended decoder,
scripts/generate_chunked_overlap_save.py:78-206, is strictly single-
stream); this engine is the production shape of that exact decoder:

* ``slots`` fixed device lanes (static shapes — XLA recompiles nothing
  as requests come and go);
* decode advances in jitted ``decode_chunk``-token scans for ALL lanes;
  between chunks the host retires finished requests and admits pending
  ones (the measured cost model: the scan itself supports ~300K bytes/s,
  end-to-end is host-RTT-amortization-bound — experiments/profile_decode);
* admission = ONE batched [M, T] prefill for the M requests admitted in
  a round (the same full-window forward ``OverlapSaveBatch.init_state``
  runs; serving is prefill-bound, so co-arriving requests share the
  forward) + a rotation of each fresh circular window into the engine's
  global write phase, so a request's math is IDENTICAL no matter when it
  is admitted;
* every lane carries its own PRNG key and sampler state, so a request's
  output depends only on (its seed, its prompt) — NOT on co-tenants or
  arrival order.  tests/unit/test_engine.py pins exactly this.

Inactive lanes keep decoding garbage into their own (isolated) windows —
cheaper than masking, and the next admission overwrites the lane wholesale.

Scheduling: admission order follows ``policy`` — "fifo" (default),
"priority" (Request.priority, higher first), "sjf" (shortest max_new
first — anti-convoy for heterogeneous lengths) or "edf" (earliest
Request.deadline first).  Because per-request math is admission-invariant,
policies change latency ordering only, never outputs.  The decode scan
length adapts to the longest remaining lane (power-of-two buckets), so a
queue tail of short requests stops paying full-chunk device time.

Two driving shapes share one core:

* **batch**: ``run(requests)`` drains a static queue and returns
  completions in submission order (the CLI / benchmark shape);
* **continuous**: ``submit(request)`` at ANY time — including while
  earlier requests are mid-decode — then ``step()`` repeatedly; each
  step admits whatever fits, advances every active lane one bucketed
  chunk, and returns the requests that finished.  Arrivals between
  steps model a live server; admission-invariance guarantees the text
  each request gets is byte-identical to what a batch run would give.

Per-request ``metrics`` record submit/admit/done in units of the chunk
counter (the device-work clock), so scheduling policies are comparable
by mean turnaround on CPU, without chip timing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.streaming.fir import DeviceSampler
from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch


@dataclass
class Request:
    prompt: str
    max_new: int = 128
    seed: int = 0
    stop: str | None = None
    priority: int = 0  # higher admitted first under policy="priority"
    deadline: float | None = None  # EDF key under policy="edf" (smaller first)


@dataclass
class _Lane:
    index: int  # position in the submitted request list
    req: Request
    prompt_bytes: list = field(default_factory=list)
    out_bytes: list = field(default_factory=list)


class ServingEngine:
    """Queue-draining exact decoder: fixed lanes, continuous admission."""

    def __init__(self, params: dict, cfg: TrainConfig, *, slots: int = 8,
                 decode_chunk: int = 32, buf_dtype: str = "float32",
                 mesh=None, policy: str = "fifo"):
        if policy not in ("fifo", "priority", "sjf", "edf"):
            raise ValueError(
                f"policy={policy!r}: expected 'fifo' (submission order), "
                "'priority' (Request.priority, higher first), 'sjf' "
                "(shortest max_new first) or 'edf' (earliest Request."
                "deadline first)")
        self.dec = OverlapSaveBatch(params, cfg, buf_dtype=buf_dtype)
        self.sampler = DeviceSampler(cfg)
        self.cfg = cfg
        self.slots = int(slots)
        self.chunk = int(decode_chunk)
        self.policy = policy
        # observability: filled by run() — completion_order lists request
        # indices in retire order; stats counts device work actually issued
        self.completion_order: list[int] = []
        self.stats = {"chunks": 0, "decoded_tokens": 0}
        # Data-parallel serving: every lane op is independent along N, so
        # sharding the lane axis over the mesh's dp devices needs ZERO
        # collectives — params replicate, lane state splits.  The jitted
        # decode/admit programs are annotation-free; the shardings below
        # propagate through them.
        self._lane_sharding = self._param_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            dp = mesh.shape.get("dp", mesh.devices.size)
            if self.slots % dp != 0:
                raise ValueError(f"slots ({self.slots}) must divide evenly "
                                 f"over dp={dp} mesh devices")
            self._lane_sharding = NamedSharding(mesh, PartitionSpec("dp"))
            self._param_sharding = NamedSharding(mesh, PartitionSpec())
            self.dec.params = jax.device_put(self.dec.params, self._param_sharding)
            self.dec.taps_list = jax.device_put(self.dec.taps_list, self._param_sharding)
        self._admit_fn = jax.jit(self._admit_impl, donate_argnums=(0, 1, 2, 3))
        self._decode_fns: dict[int, object] = {}  # scan length -> jitted fn
        # continuous-admission state (created lazily by start()/submit())
        self._started = False
        self._next_id = 0
        self._pending: list[tuple[int, Request]] = []
        self._state = None  # (bufs, samp, logits, keys, ptr)
        self._lanes: dict[int, _Lane] = {}
        self._free: list[int] = []
        self.results: dict[int, str] = {}  # request id -> completed text
        self.metrics: dict[int, dict] = {}  # id -> submit/admit/done chunks

    # -- device programs ----------------------------------------------------

    def _admit_impl(self, bufs, samp, logits, keys, ptr, slot,
                    fresh_bufs, fresh_logits, fresh_samp, fresh_key):
        """Insert a freshly prefilled stream into lane ``slot``.

        ``fresh_bufs`` come from a ptr=0 prefill (oldest at slot 0); the
        engine's next write goes to slot ``ptr``, so rotate the fresh
        window by ``ptr`` along time — after which the lane is
        indistinguishable from one initialized at engine start.
        """
        new_bufs = [
            b.at[slot].set(jnp.roll(f[0], ptr, axis=0).astype(b.dtype))
            for b, f in zip(bufs, fresh_bufs)
        ]
        samp = jax.tree.map(lambda s, f: s.at[slot].set(f), samp, fresh_samp)
        logits = logits.at[slot].set(fresh_logits[0])
        keys = keys.at[slot].set(fresh_key)
        return new_bufs, samp, logits, keys

    def _decode_impl(self, params, bufs, samp, logits, keys, ptr, *, length):
        """``length`` tokens for every lane in one scan.  Per-lane keys:
        lane output is a pure function of (lane seed, lane logits)."""
        dec, sampler = self.dec, self.sampler
        taps_list = dec.taps_list

        def body(carry, _):
            bufs, samp, logits, keys, ptr = carry
            l = jax.vmap(sampler.process_logits)(logits, samp)
            split = jax.vmap(jax.random.split)(keys)  # [N, 2, 2]
            keys, subs = split[:, 0], split[:, 1]
            nxt, samp = jax.vmap(sampler.draw_and_update)(subs, l, samp)
            (bufs, ptr), logits = dec._token_step(params, taps_list, (bufs, ptr), nxt)
            return (bufs, samp, logits, keys, ptr), nxt

        (bufs, samp, logits, keys, ptr), out = jax.lax.scan(
            body, (bufs, samp, logits, keys, ptr), None, length=length)
        return bufs, samp, logits, keys, ptr, out  # out [length, N]

    def _decode_fn(self, length: int):
        """Jitted decode program for one scan-length bucket (cached)."""
        fn = self._decode_fns.get(length)
        if fn is None:
            import functools

            fn = jax.jit(functools.partial(self._decode_impl, length=length),
                         donate_argnums=(1, 2, 3, 4))
            self._decode_fns[length] = fn
        return fn

    # -- host loop ----------------------------------------------------------

    def _blank_state(self):
        N, T = self.slots, self.dec.T
        blank = np.full((N, T), 32, np.int32)
        (bufs, ptr), logits = self.dec.init_state(blank)
        samp = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[self.sampler.init_state([32]) for _ in range(N)],
        )
        keys = jnp.stack([jax.random.PRNGKey(0)] * N)
        if self._lane_sharding is not None:
            bufs = jax.device_put(bufs, self._lane_sharding)
            samp = jax.device_put(samp, self._lane_sharding)
            logits = jax.device_put(logits, self._lane_sharding)
            keys = jax.device_put(keys, self._lane_sharding)
        return bufs, samp, logits, keys, ptr

    def _prefill_many(self, reqs: list):
        """ONE batched [M_pad, T] prefill forward for every request
        admitted this round.  Serving is prefill-bound (experiments/
        profile_decode), so M requests admitted together must not pay M
        full-window forwards.  M is padded to a power of two (blank
        windows, rows discarded) so the jit variants stay bounded by
        log2(slots)+1; per-row math is independent along the batch axis,
        so results match the M=1 prefill."""
        T = self.dec.T
        m_pad = 1
        while m_pad < len(reqs):
            m_pad <<= 1
        windows = np.full((m_pad, T), 32, np.int32)
        encs = []
        for i, req in enumerate(reqs):
            enc = list(req.prompt.encode("utf-8", errors="ignore")) or [32]
            encs.append(enc)
            tail = enc[-T:]
            windows[i, T - len(tail):] = tail
        fresh_bufs, _, fresh_logits = self.dec._init_fn(
            self.dec.params, jnp.asarray(windows))
        self.stats["prefill_calls"] = self.stats.get("prefill_calls", 0) + 1
        out = []
        for i, (req, enc) in enumerate(zip(reqs, encs)):
            fb = [b[i:i + 1] for b in fresh_bufs]
            out.append((enc, fb, fresh_logits[i:i + 1],
                        self.sampler.init_state(enc),
                        jax.random.PRNGKey(req.seed)))
        return out

    def _prefill(self, req: Request):
        """Single-request prefill (the M=1 case of ``_prefill_many``)."""
        return self._prefill_many([req])[0]

    def _admission_key(self, item):
        """Sort key implementing the admission policy; stable sort keeps
        submission order among ties, and results stay submission-indexed
        regardless of policy."""
        idx, req = item
        if self.policy == "priority":
            return (-req.priority, idx)
        if self.policy == "sjf":
            return (req.max_new, idx)
        if self.policy == "edf":
            d = req.deadline
            return (d if d is not None else float("inf"), idx)
        return idx  # fifo

    def _bucket(self, lanes) -> int:
        """Scan length for this iteration: the full decode_chunk while any
        lane needs it, else the smallest power-of-two covering the longest
        remaining lane — short tails stop paying for full chunks (the
        anti-convoy half of the scheduling story; each distinct length is
        one extra cached jit, bounded by log2(decode_chunk))."""
        need = max(
            (lane.req.max_new - len(lane.out_bytes) for lane in lanes.values()),
            default=1,
        )
        if need >= self.chunk:
            return self.chunk
        b = 1
        while b < need:
            b <<= 1
        return min(b, self.chunk)

    def start(self) -> None:
        """(Re)initialize lane state for a fresh serving session.  Called
        implicitly by the first ``submit``/``step``; call explicitly to
        reset a used engine."""
        self._state = self._blank_state()
        self._free = list(range(self.slots))
        self._lanes = {}
        self._pending = []
        self._next_id = 0
        self.results = {}
        self.metrics = {}
        self.completion_order = []
        self.stats = {"chunks": 0, "decoded_tokens": 0}
        self._started = True

    @property
    def idle(self) -> bool:
        """True when no request is pending or mid-decode."""
        return not self._pending and not self._lanes

    def submit(self, req) -> int:
        """Enqueue a request — legal at ANY time, including mid-decode
        between ``step`` calls.  Returns the request id used as the key in
        ``results``/``metrics``.  Ids count up in submission order."""
        if not self._started:
            self.start()
        rid = self._next_id
        self._next_id += 1
        if not isinstance(req, Request):
            req = Request(prompt=str(req))
        self._pending.append((rid, req))
        self.metrics[rid] = {"submit_chunk": self.stats["chunks"]}
        return rid

    def _admit_all(self) -> None:
        """Fill free lanes from the pending queue in policy order.  The
        sort is stable and re-applied per admission round, so requests
        submitted after earlier rounds join the ordering seamlessly."""
        if not (self._pending and self._free):
            return
        self._pending.sort(key=self._admission_key)
        batch = []  # (slot, rid, req) admitted this round
        while self._pending and self._free:
            batch.append((self._free.pop(), *self._pending.pop(0)))
        fresh = self._prefill_many([req for _, _, req in batch])
        bufs, samp, logits, keys, ptr = self._state
        for (slot, rid, req), (enc, fb, fl, fs, fk) in zip(batch, fresh):
            bufs, samp, logits, keys = self._admit_fn(
                bufs, samp, logits, keys, ptr, jnp.int32(slot), fb, fl, fs, fk)
            self._lanes[slot] = _Lane(index=rid, req=req, prompt_bytes=enc)
            self.metrics[rid]["admit_chunk"] = self.stats["chunks"]
        self._state = (bufs, samp, logits, keys, ptr)

    def step(self) -> list[tuple[int, str]]:
        """Admit whatever fits, advance every active lane one bucketed
        chunk, retire finished requests.  Returns [(id, text), ...] for the
        requests that completed this step (empty while lanes are mid-
        flight, or immediately when the engine is idle)."""
        if not self._started:
            self.start()
        self._admit_all()
        if not self._lanes:
            return []

        length = self._bucket(self._lanes)
        bufs, samp, logits, keys, ptr, out = self._decode_fn(length)(
            self.dec.params, *self._state)
        self._state = (bufs, samp, logits, keys, ptr)
        out = np.asarray(out)
        self.stats["chunks"] += 1
        self.stats["decoded_tokens"] += length * self.slots

        completed: list[tuple[int, str]] = []
        for slot in list(self._lanes):
            lane = self._lanes[slot]
            take = min(length, lane.req.max_new - len(lane.out_bytes))
            lane.out_bytes.extend(int(b) for b in out[:take, slot])
            done = len(lane.out_bytes) >= lane.req.max_new
            if lane.req.stop:
                stop_b = lane.req.stop.encode("utf-8")
                pos = bytes(lane.out_bytes).find(stop_b)
                if pos >= 0:
                    lane.out_bytes = lane.out_bytes[: pos + len(stop_b)]
                    done = True
            if done:
                text = bytes(lane.prompt_bytes + lane.out_bytes).decode(
                    "utf-8", errors="replace")
                self.results[lane.index] = text
                self.metrics[lane.index]["done_chunk"] = self.stats["chunks"]
                self.completion_order.append(lane.index)
                completed.append((lane.index, text))
                del self._lanes[slot]
                self._free.append(slot)
        return completed

    def turnaround(self) -> dict:
        """Mean/max completed-request turnaround in chunk units (the
        device-work clock): done_chunk - submit_chunk.  The CPU-comparable
        scheduling metric — policies reorder admission, turnaround shows
        what that buys."""
        waits = [m["done_chunk"] - m["submit_chunk"]
                 for m in self.metrics.values() if "done_chunk" in m]
        if not waits:
            return {"completed": 0, "mean": 0.0, "max": 0}
        return {"completed": len(waits),
                "mean": float(sum(waits)) / len(waits),
                "max": int(max(waits))}

    def run(self, requests: list, *, progress=None) -> list[str]:
        """Drain a static request queue; returns prompt+completion per
        request, in submission order.  ``progress(done, total)`` is called
        per chunk.  Resets any prior engine state.

        Admission follows ``self.policy`` ("fifo"/"priority"/"sjf"/"edf");
        per-request math is admission-order-invariant (the rotation +
        per-lane keys), so policy changes WHEN a request runs, never WHAT
        it produces — pinned by tests/unit/test_engine.py."""
        self.start()
        ids = [self.submit(r) for r in requests]
        while not self.idle:
            self.step()
            if progress is not None:
                progress(len(self.results), len(requests))
        return [self.results[rid] for rid in ids]
