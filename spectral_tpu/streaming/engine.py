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
  forward) + ONE scatter program inserting all M lanes (``_admit_impl``,
  out-of-bounds rows dropped) + a rotation of each fresh circular window
  into the engine's global write phase, so a request's math is IDENTICAL
  no matter when it is admitted;
* every lane carries its own PRNG key and sampler state, so a request's
  output depends only on (its seed, its prompt) — NOT on co-tenants or
  arrival order.  tests/unit/test_engine.py pins exactly this.

Inactive lanes keep decoding garbage into their own (isolated) windows —
cheaper than masking, and the next admission overwrites the lane wholesale.

Scheduling: admission order follows ``policy`` — "fifo" (default),
"priority" (Request.priority, higher first), "sjf" (shortest max_new
first — anti-convoy for heterogeneous lengths) or "edf" (earliest
Request.deadline first).  Because per-request math is admission-invariant,
policies change latency ordering only, never outputs.  Scan lengths are
sized to the EVENT HORIZON — the earliest retirement among active lanes
(``_bucket``): multiple chunks run in one dispatch while nothing can
retire, and short tails shrink below a chunk, so neither the tunnel RTT
nor full-chunk padding convoys the queue.

**The host never blocks mid-drain** (``step(fetch=False)``, what ``run``
uses): retirement is by token COUNT, which the host knows without reading
a single output byte, so decode chunks, prefills and admits are issued as
one asynchronous dispatch chain and the only value fetch is ``finalize()``
at the end.  On the tunneled chip this matters more than device work:
the first (per-chunk-sync) engine measured 1.43 s for a queue whose device
work was ~0.2 s — every chunk paid a host RTT (experiments/
profile_engine.py).  Stop-sequence requests are the exception: deciding
"did the stop string appear" needs bytes, so any active stop-bearing lane
forces that chunk to fetch (correctness first, pipelining where legal).

Two driving shapes share one core:

* **batch**: ``run(requests)`` drains a static queue and returns
  completions in submission order (the CLI / benchmark shape);
* **continuous**: ``submit(request)`` at ANY time — including while
  earlier requests are mid-decode — then ``step()`` repeatedly; each
  step admits whatever fits, advances every active lane one bucketed
  chunk, and returns the requests that finished.  Arrivals between
  steps model a live server; admission-invariance guarantees the text
  each request gets is byte-identical to what a batch run would give
  (BIT-exact under ``prefill_exact=True``; the default batched
  admission is exact in real arithmetic with a ~1e-6 cross-batch-size
  logit reorder that can flip a knife-edge sampled byte on very long
  decodes — see the __init__ note).

Per-request ``metrics`` record submit/admit/done on the device-work
clock (cumulative scan tokens issued), so scheduling policies are
comparable by mean turnaround on CPU, without chip timing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.streaming.fir import DeviceSampler
from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

# (cfg, slots, chunk, buf_dtype, mesh) -> {"admit": fn, "decode": {len: fn}}
# shared across ServingEngine instances — see __init__
_SHARED_JITS: dict = {}


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
    slot: int
    prompt_bytes: list = field(default_factory=list)
    # ordered completion parts: either a list[int] of fetched bytes or a
    # (chunk_seq, take, slot) span into a not-yet-fetched chunk output
    parts: list = field(default_factory=list)
    n_done: int = 0  # host-known decoded count (drives retirement)


class ServingEngine:
    """Queue-draining exact decoder: fixed lanes, continuous admission."""

    # finalize() automatically once this many unfetched chunk outputs
    # accumulate (bounds host+device memory in a long async session)
    MAX_PENDING_CHUNKS = 64
    # event-horizon scheduling: largest scan is MAX_MULTI * decode_chunk
    # tokens (bounds the jit-variant ladder and the overshoot past a
    # mid-scan arrival the host hasn't seen yet)
    MAX_MULTI = 8

    def __init__(self, params: dict, cfg: TrainConfig, *, slots: int = 8,
                 decode_chunk: int = 32, buf_dtype: str = "float32",
                 mesh=None, policy: str = "fifo",
                 prefill_exact: bool = False):
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
        # Admission-prefill bit-exactness (round-5 finding, chip-probed):
        # the DECODE path is bit-exact by per-lane-phase construction and
        # across scan-length buckets (probe: scan(8) == scan(4)+scan(4)
        # to the bit), and the batched admission prefill produces
        # BIT-IDENTICAL window buffers across batch sizes — but the
        # admission LOGITS differed by 1.3e-3 relative between M=1 and
        # M>1 rounds: XLA lowered the final [M, C] x [C, 256] matmul to
        # a VPU fp32 matvec at M=1 but an MXU bf16 GEMM at M>1 (DEFAULT
        # precision).  That first-byte distribution wobble flipped a
        # knife-edge nucleus decision for 1 request in 256 at decode-
        # heavy shape (benchmark_serving_production).  The logits matmul
        # is now pinned HIGHEST (overlap_save_batch._init_impl), cutting
        # the cross-program variance to 1.9e-6 (fp32 accumulation-order
        # class) — but bit-equality across DIFFERENT XLA programs cannot
        # be promised by precision flags alone, so prefill_exact=True
        # runs one M=1 prefill per admitted request (the exact program a
        # solo engine runs): busy == solo returns to BIT-exact
        # end-to-end, at a measured admission-cost multiple for
        # multi-request rounds.  The default keeps the batched prefill:
        # exact-in-real-arithmetic admission + bit-exact decode.
        self.prefill_exact = bool(prefill_exact)
        # observability: filled by run() — completion_order lists request
        # indices in retire order; stats counts device work actually issued
        self.completion_order: list[int] = []
        self.stats = {"chunks": 0, "decoded_tokens": 0, "scan_tokens": 0}
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
        # Jitted programs shared ACROSS engine instances with the same
        # (cfg, slots, chunk, buf_dtype, sharding): per-instance jax.jit
        # wrappers re-trace + re-compile every scan-length/admit variant —
        # on the tunneled chip that measured 3-23 s per "step" in any
        # workflow constructing engines repeatedly (one per benchmark rep,
        # one per serve_fleet invocation...).  The impls take params and
        # taps as arguments, so the shared trace has no instance state.
        # mesh identity must be STABLE — id(mesh) can be reused after the
        # mesh is garbage-collected, silently serving another mesh's
        # programs (r4 advisor) — and the cached jits bind to a
        # params-free twin so the cache never pins an engine (or its
        # decoder's device-resident param tree) for the process lifetime.
        mesh_key = None if mesh is None else (
            tuple(mesh.axis_names), tuple(sorted(mesh.shape.items())),
            tuple(d.id for d in mesh.devices.flat))
        jkey = (tuple(sorted(cfg.to_dict().items())), self.slots, self.chunk,
                str(self.dec.buf_dtype), mesh_key)
        progs = _SHARED_JITS.setdefault(jkey, {})
        if "admit" not in progs:
            import copy

            twin = copy.copy(self)
            twin.dec = self.dec.config_twin()
            progs["twin"] = twin
            progs["admit"] = jax.jit(twin._admit_impl,
                                     donate_argnums=(0, 1, 2, 3, 4, 5))
            progs["decode"] = {}
        self._shared_twin = progs["twin"]
        self._admit_fn = progs["admit"]
        self._decode_fns: dict[int, object] = progs["decode"]  # length -> fn
        # continuous-admission state (created lazily by start()/submit())
        self._started = False
        self._next_id = 0
        self._pending: list[tuple[int, Request]] = []
        self._state = None  # (bufs, samp, logits, keys, ptr)
        self._lanes: dict[int, _Lane] = {}
        self._free: list[int] = []
        self._chunk_outs: dict[int, jax.Array] = {}  # chunk seq -> [len, N]
        self._deferred: list[_Lane] = []  # retired, text not yet fetched
        self.results: dict[int, str] = {}  # request id -> completed text
        self.metrics: dict[int, dict] = {}  # id -> submit/admit/done chunks

    # -- device programs ----------------------------------------------------

    def _admit_impl(self, bufs, samp, logits, keys, ptrs, ws, slots_arr,
                    fresh_bufs, fresh_logits, fresh_samp, fresh_keys,
                    fresh_ptrs, fresh_ws):
        """Insert one admission round of freshly prefilled streams — ALL M
        lanes in ONE scatter program (the per-slot loop paid one dispatch
        RTT per admitted request).

        ``slots_arr`` is [M_pad] int32, padded entries = ``self.slots``
        (out of bounds, dropped by ``mode="drop"``).  Lanes carry their
        OWN write phase (``ptrs``) and tap rows (``ws``), so a fresh
        lane's buffers are inserted UNROTATED at its own phase 0 — its
        layout (and fp reduction order) is identical to a solo run at
        every subsequent step, which is what makes admission invariance
        BIT-exact rather than exact-in-real-arithmetic (see
        overlap_save_batch._init_impl).
        """
        new_bufs = [
            b.at[slots_arr].set(f.astype(b.dtype), mode="drop")
            for b, f in zip(bufs, fresh_bufs)
        ]
        samp = jax.tree.map(
            lambda s, f: s.at[slots_arr].set(f, mode="drop"), samp, fresh_samp)
        logits = logits.at[slots_arr].set(fresh_logits, mode="drop")
        keys = keys.at[slots_arr].set(fresh_keys, mode="drop")
        ptrs = ptrs.at[slots_arr].set(fresh_ptrs, mode="drop")
        ws = [w.at[slots_arr].set(f, mode="drop")
              for w, f in zip(ws, fresh_ws)]
        return new_bufs, samp, logits, keys, ptrs, ws

    def _decode_impl(self, params, bufs, samp, logits, keys, ptrs, ws,
                     *, length):
        """``length`` tokens for every lane in one scan.  Per-lane keys:
        lane output is a pure function of (lane seed, lane logits).
        Taps ride in state (per-lane ``ws`` rows), so the jitted program
        has no closure constants and is engine-instance-independent
        (_SHARED_JITS)."""
        dec, sampler = self.dec, self.sampler

        def body(carry, _):
            bufs, samp, logits, keys, ptrs, ws = carry
            l = jax.vmap(sampler.process_logits)(logits, samp)
            split = jax.vmap(jax.random.split)(keys)  # [N, 2, 2]
            keys, subs = split[:, 0], split[:, 1]
            nxt, samp = jax.vmap(sampler.draw_and_update)(subs, l, samp)
            (bufs, ptrs, ws), logits = dec._token_step(
                params, (bufs, ptrs, ws), nxt)
            return (bufs, samp, logits, keys, ptrs, ws), nxt

        (bufs, samp, logits, keys, ptrs, ws), out = jax.lax.scan(
            body, (bufs, samp, logits, keys, ptrs, ws), None, length=length)
        return bufs, samp, logits, keys, ptrs, ws, out  # out [length, N]

    def _decode_fn(self, length: int):
        """Jitted decode program for one scan-length bucket (cached in the
        module-level shared store, so every engine with the same
        (cfg, slots, chunk, buf_dtype) reuses the compiled program)."""
        fn = self._decode_fns.get(length)
        if fn is None:
            import functools

            fn = jax.jit(
                functools.partial(self._shared_twin._decode_impl,
                                  length=length),
                donate_argnums=(1, 2, 3, 4, 5, 6))
            self._decode_fns[length] = fn
        return fn

    # -- host loop ----------------------------------------------------------

    def _blank_state(self):
        N, T = self.slots, self.dec.T
        blank = np.full((N, T), 32, np.int32)
        (bufs, ptrs, ws), logits = self.dec.init_state(blank)
        samp = self.sampler.init_state_batch([[32]] * N)
        keys = jnp.stack([jax.random.PRNGKey(0)] * N)
        if self._lane_sharding is not None:
            bufs = jax.device_put(bufs, self._lane_sharding)
            samp = jax.device_put(samp, self._lane_sharding)
            logits = jax.device_put(logits, self._lane_sharding)
            keys = jax.device_put(keys, self._lane_sharding)
            ptrs = jax.device_put(ptrs, self._lane_sharding)
            ws = jax.device_put(ws, self._lane_sharding)
        return bufs, samp, logits, keys, ptrs, ws

    def _prefill_many(self, reqs: list):
        """ONE batched [M_pad, T] prefill forward for every request
        admitted this round.  Serving is prefill-bound (experiments/
        profile_decode), so M requests admitted together must not pay M
        full-window forwards.  M is padded to a power of two (blank
        windows, rows dropped at scatter) so the jit variants stay bounded
        by log2(slots)+1; per-row math is independent along the batch
        axis, so results match the M=1 prefill.

        Returns ``(encs, fresh_bufs, fresh_logits, fresh_samp,
        fresh_keys, fresh_ptrs, fresh_ws, m_pad)`` with every device value
        BATCHED [m_pad, ...] — the shape ``_admit_impl`` scatters in one
        program."""
        T = self.dec.T
        # m_pad stays the pow2 ladder in BOTH modes: _admit_impl is jitted
        # per m_pad, so an arbitrary M would spawn unbounded scatter
        # variants (each a minutes-long remote compile on the tunneled
        # chip).  prefill_exact pads with ZERO rows — padded rows are
        # dropped by the scatter (slots_arr = self.slots, mode="drop"),
        # so their values never land.
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
        if self.prefill_exact:
            # one M=1 program per REQUEST — bit-identical to serving it
            # alone on this engine config; pad rows are zeros (dropped at
            # the scatter), stacked device-side for the admit program
            rows = [self.dec._init_fn(self.dec.params,
                                      jnp.asarray(windows[i:i + 1]))
                    for i in range(len(reqs))]
            npad = m_pad - len(reqs)

            def stack(parts):
                if npad:
                    parts = parts + [jnp.zeros_like(parts[0])] * npad
                return jnp.concatenate(parts)

            fresh_bufs = [stack([r[0][l] for r in rows])
                          for l in range(self.dec.n_layers)]
            fresh_ptrs = stack([r[1] for r in rows])
            fresh_ws = [stack([r[2][l] for r in rows])
                        for l in range(self.dec.n_layers)]
            fresh_logits = stack([r[3] for r in rows])
            self.stats["prefill_calls"] = (
                self.stats.get("prefill_calls", 0) + len(reqs))
        else:
            fresh_bufs, fresh_ptrs, fresh_ws, fresh_logits = self.dec._init_fn(
                self.dec.params, jnp.asarray(windows))
            self.stats["prefill_calls"] = self.stats.get("prefill_calls", 0) + 1
        fresh_samp = self.sampler.init_state_batch(
            encs + [[32]] * (m_pad - len(reqs)))
        seeds = [req.seed for req in reqs] + [0] * (m_pad - len(reqs))
        fresh_keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds))
        return (encs, fresh_bufs, fresh_logits, fresh_samp, fresh_keys,
                fresh_ptrs, fresh_ws, m_pad)

    def _prefill(self, req: Request):
        """Single-request prefill (the M=1 row of ``_prefill_many``)."""
        encs, fb, fl, fs, fk, fp, fw, _ = self._prefill_many([req])
        return (encs[0], [b[0:1] for b in fb], fl[0:1],
                jax.tree.map(lambda x: x[0], fs), fk[0])

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
        """Scan length for this iteration, sized to the EVENT HORIZON —
        the earliest retirement among active lanes:

        * nothing can retire for >= decode_chunk tokens -> run MULTIPLE
          chunks in one scan (power-of-two multiples up to MAX_MULTI x
          chunk).  Between events there is no host decision to make, so
          chunk-at-a-time dispatching only buys tunnel RTTs (measured:
          the per-chunk engine spent 5x its device time on dispatch —
          experiments/profile_engine.py);
        * the earliest retirement is < decode_chunk away -> the smallest
          power-of-two covering it, so short tails stop paying full
          chunks and the freed slot admits the next request immediately.

        Never overshoots the earliest retirement by more than the pow2
        rounding, so pending requests are not convoyed behind an oversized
        scan.  Each distinct length is one cached jit; the ladder is
        bounded by log2(decode_chunk) + log2(MAX_MULTI) programs.

        Stop-bearing lanes have an UNKNOWABLE event horizon (the stop
        string can land on any byte), so any active stop caps the scan at
        one ``decode_chunk``: a multi-chunk scan would decode up to
        MAX_MULTI*chunk tokens past the stop, hold the slot, and convoy
        pending requests behind the oversized (and force-fetched) scan."""
        need = min(lane.req.max_new - lane.n_done for lane in lanes.values())
        if any(lane.req.stop for lane in lanes.values()):
            need = min(need, self.chunk)
        if need >= self.chunk:
            m = 1
            while m * 2 * self.chunk <= need and m * 2 <= self.MAX_MULTI:
                m *= 2
            return m * self.chunk
        b = 1
        while b < need:
            b <<= 1
        return b

    def start(self) -> None:
        """(Re)initialize lane state for a fresh serving session.  Called
        implicitly by the first ``submit``/``step``; call explicitly to
        reset a used engine."""
        self._state = self._blank_state()
        self._free = list(range(self.slots))
        self._lanes = {}
        self._pending = []
        self._next_id = 0
        self._chunk_outs = {}
        self._deferred = []
        self.results = {}
        self.metrics = {}
        self.completion_order = []
        self.stats = {"chunks": 0, "decoded_tokens": 0, "scan_tokens": 0}
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
        self.metrics[rid] = {"submit_work": self.stats["scan_tokens"]}
        return rid

    def _admit_all(self) -> None:
        """Fill free lanes from the pending queue in policy order — one
        batched prefill + ONE scatter dispatch for the whole round.  The
        sort is stable and re-applied per admission round, so requests
        submitted after earlier rounds join the ordering seamlessly."""
        if not (self._pending and self._free):
            return
        self._pending.sort(key=self._admission_key)
        batch = []  # (slot, rid, req) admitted this round
        while self._pending and self._free:
            batch.append((self._free.pop(), *self._pending.pop(0)))
        encs, fb, fl, fs, fk, fp, fw, m_pad = self._prefill_many(
            [req for _, _, req in batch])
        slots_arr = np.full((m_pad,), self.slots, np.int32)  # pad -> dropped
        for i, (slot, _, _) in enumerate(batch):
            slots_arr[i] = slot
        bufs, samp, logits, keys, ptrs, ws = self._state
        bufs, samp, logits, keys, ptrs, ws = self._admit_fn(
            bufs, samp, logits, keys, ptrs, ws, jnp.asarray(slots_arr),
            fb, fl, fs, fk, fp, fw)
        for (slot, rid, req), enc in zip(batch, encs):
            self._lanes[slot] = _Lane(index=rid, req=req, slot=slot,
                                      prompt_bytes=enc)
            self.metrics[rid]["admit_work"] = self.stats["scan_tokens"]
        self._state = (bufs, samp, logits, keys, ptrs, ws)

    def step(self, fetch: bool = True) -> list[tuple[int, str | None]]:
        """Admit whatever fits, advance every active lane one bucketed
        chunk, retire finished requests.  Returns [(id, text), ...] for the
        requests that completed this step (empty while lanes are mid-
        flight, or immediately when the engine is idle).

        ``fetch=False`` defers the output-byte transfer: retirement is by
        token count (host-known), so the step issues its device programs
        WITHOUT blocking on the chunk result — completions come back as
        ``(id, None)`` and their text lands in ``results`` at
        ``finalize()``.  A chunk in which any active lane carries a stop
        sequence fetches regardless (stop detection needs bytes)."""
        if not self._started:
            self.start()
        self._admit_all()
        if not self._lanes:
            return []

        length = self._bucket(self._lanes)
        bufs, samp, logits, keys, ptrs, ws, out = self._decode_fn(length)(
            self.dec.params, *self._state)
        self._state = (bufs, samp, logits, keys, ptrs, ws)
        seq = self.stats["chunks"]
        self.stats["chunks"] += 1
        self.stats["decoded_tokens"] += length * self.slots
        self.stats["scan_tokens"] += length

        fetch_now = fetch or any(l.req.stop for l in self._lanes.values())
        out_np = np.asarray(out) if fetch_now else None
        if not fetch_now:
            self._chunk_outs[seq] = out

        completed: list[tuple[int, str | None]] = []
        for slot in list(self._lanes):
            lane = self._lanes[slot]
            take = min(length, lane.req.max_new - lane.n_done)
            if fetch_now:
                lane.parts.append([int(b) for b in out_np[:take, slot]])
            else:
                lane.parts.append((seq, take, slot))
            lane.n_done += take
            done = lane.n_done >= lane.req.max_new
            if lane.req.stop:
                # stop-bearing lanes force fetch_now, so parts are all bytes
                flat = [b for part in lane.parts for b in part]
                stop_b = lane.req.stop.encode("utf-8")
                pos = bytes(flat).find(stop_b)
                if pos >= 0:
                    lane.parts = [flat[: pos + len(stop_b)]]
                    lane.n_done = pos + len(stop_b)
                    done = True
            if done:
                # work-clock at the token this lane actually finished on:
                # a stop truncation or sub-chunk tail completes mid-scan,
                # so discount the scan tokens issued past its last take
                self.metrics[lane.index]["done_work"] = (
                    self.stats["scan_tokens"] - (length - take))
                self.completion_order.append(lane.index)
                del self._lanes[slot]
                self._free.append(slot)
                if all(isinstance(p, list) for p in lane.parts):
                    text = self._assemble(lane, {})
                    completed.append((lane.index, text))
                else:
                    self._deferred.append(lane)
                    completed.append((lane.index, None))
        if len(self._chunk_outs) > self.MAX_PENDING_CHUNKS:
            self.finalize()
        return completed

    def _assemble(self, lane: _Lane, fetched: dict) -> str:
        """Concatenate a retired lane's parts (fetching spans from
        ``fetched``: chunk seq -> np [len, N]) into its result text."""
        out: list[int] = []
        for part in lane.parts:
            if isinstance(part, list):
                out.extend(part)
            else:
                seq, take, slot = part
                out.extend(int(b) for b in fetched[seq][:take, slot])
        text = bytes(lane.prompt_bytes + out).decode("utf-8", errors="replace")
        self.results[lane.index] = text
        return text

    def finalize(self) -> None:
        """Fetch every deferred chunk output in one transfer and assemble
        the texts of retired-but-unread requests into ``results``.  Spans
        held by still-active lanes are materialized to bytes too, so all
        device chunk buffers are released."""
        if not self._chunk_outs and not self._deferred:
            return
        fetched = {seq: np.asarray(arr)
                   for seq, arr in self._chunk_outs.items()}
        self._chunk_outs = {}
        for lane in self._deferred:
            self._assemble(lane, fetched)
        self._deferred = []
        for lane in self._lanes.values():  # active lanes: spans -> bytes
            lane.parts = [
                part if isinstance(part, list)
                else [int(b) for b in fetched[part[0]][:part[1], part[2]]]
                for part in lane.parts
            ]

    def turnaround(self) -> dict:
        """Mean/max completed-request turnaround on the device-WORK clock
        (cumulative scan tokens issued): done_work - submit_work.  Scans
        have different lengths under event-horizon scheduling, so counting
        chunks would weight a 256-token scan equal to a 4-token tail; the
        token clock stays proportional to device time.  The CPU-comparable
        scheduling metric — policies reorder admission, turnaround shows
        what that buys."""
        waits = [m["done_work"] - m["submit_work"]
                 for m in self.metrics.values() if "done_work" in m]
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
        it produces — pinned by tests/unit/test_engine.py.  The drain is
        fully asynchronous (``step(fetch=False)``): no host sync until the
        single ``finalize()`` at the end."""
        self.start()
        ids = [self.submit(r) for r in requests]
        while not self.idle:
            self.step(fetch=False)
            if progress is not None:
                progress(len(self.completion_order), len(requests))
        self.finalize()
        return [self.results[rid] for rid in ids]
