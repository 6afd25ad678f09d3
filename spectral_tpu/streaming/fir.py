"""O(K)-per-token FIR streaming decode.

Reference: scripts/stream_generate_fast.py:31-143.

The causal FFT-conv has a finite K-tap time-domain kernel, so inference can
stream with a ring buffer of the last K pre-norm activations per block:

    y_t = sum_i kernel[i] * xn_{t-i}        (FIR dot, O(K*C))

Approximations inherited from the reference (documented there at :88-96):
* the per-frequency gate is dropped (not representable in finite FIR form);
  it IS exact when the gate is fully open (sigmoid(logits) ~ 1) — the parity
  test pins that case bit-for-bit against the full forward;
* the context gate uses the current token's representation instead of the
  window mean.

TPU-native: warmup is one ``lax.scan`` over the prefix (the reference loops
tokens in Python); the per-token step is a single jitted function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig

from spectral_tpu.ops.pallas_block import layernorm as _layernorm


def _ffn(p, x):
    h = _layernorm(x, p["ffn_ln"]["scale"], p["ffn_ln"]["bias"])
    h = h @ p["ffn_in"]["kernel"] + p["ffn_in"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["ffn_out"]["kernel"] + p["ffn_out"]["bias"]
    return x + h


class FIRStream:
    """Streaming decoder over a trained FixedSpectralLM param tree.

    Usage:
        stream = FIRStream(params, cfg)
        state = stream.init_state(batch=1)
        state = stream.warmup(state, prefix_ids)          # [B, T0]
        state, logits = stream.next_logits(state, last_id)  # [B] -> [B, 256]
    """

    def __init__(self, params: dict, cfg: TrainConfig):
        # checkpoints restore as numpy leaves; commit to device arrays so the
        # pure functions can close over them under jit
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.n_layers = cfg.n_layers
        self.kernel_len = cfg.kernel_len
        self.d_model = cfg.d_model
        # jit once per instance
        self._step = jax.jit(self._step_impl)
        self._warmup = jax.jit(self._warmup_impl)

    # -- pure functions -----------------------------------------------------

    def _block_step(self, bp: dict, x_t: jax.Array, buf: jax.Array, pos):
        """One token through one block.  x_t: [B, C], buf: [B, K, C].

        The buffer is CIRCULAR: this token's pre-norm activation is written
        at slot ``pos`` via dynamic_update_slice (one [B, 1, C] write) and
        the K-tap kernel is rotated to align — the earlier jnp.roll layout
        rewrote the entire [B, K, C] buffer per layer per token, which at
        serving batch sizes is ~100x the necessary HBM traffic (the fleet's
        buffers exceed VMEM, so every roll was an HBM round trip).  Slot s
        holds the token (pos - s) mod K steps back; unwritten slots are
        zero, so the wrapped kernel taps contribute nothing — bit-identical
        to the roll layout (pinned by test_matches_full_forward)."""
        xn = _layernorm(x_t, bp["ln"]["scale"], bp["ln"]["bias"])
        buf = jax.lax.dynamic_update_slice(buf, xn[:, None, :], (0, pos, 0))
        # w[s] = kernel[(pos - s) mod K]: newest weight on the slot just written
        w = jnp.roll(bp["kernel"][::-1], pos + 1)
        y = jnp.sum(buf * w[None, :, None], axis=1)
        y = y * bp["gain"][None, :]
        # context gate approximated with the current token's representation
        g_ctx = jax.nn.sigmoid(xn @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        y = y * g_ctx
        x = x_t + y
        return _ffn(bp["ffn"], x), buf

    def _token_step(self, params, x_id: jax.Array, state):
        """x_id: [B] int32 -> (hidden [B, C], new state)."""
        bufs, pos = state
        h = params["embed"]["embedding"][x_id]
        new_bufs = []
        for i in range(self.n_layers):
            h, b = self._block_step(params[f"block_{i}"], h, bufs[i], pos)
            new_bufs.append(b)
        return h, (new_bufs, (pos + 1) % self.kernel_len)

    def _step_impl(self, params, state, x_id):
        h, state = self._token_step(params, x_id, state)
        h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        logits = h @ params["embed"]["embedding"].T
        return state, logits

    def _warmup_impl(self, params, state, prefix_ids):
        """prefix_ids: [B, T0] — scan the FIR state over the prefix."""

        def body(state, ids_t):
            _, state = self._token_step(params, ids_t, state)
            return state, None

        state, _ = jax.lax.scan(body, state, jnp.swapaxes(prefix_ids, 0, 1))
        return state

    # -- public API ---------------------------------------------------------

    def init_state(self, batch: int = 1):
        """Opaque decode state: (per-layer circular buffers, write slot)."""
        bufs = [
            jnp.zeros((batch, self.kernel_len, self.d_model), jnp.float32)
            for _ in range(self.n_layers)
        ]
        return (bufs, jnp.int32(0))

    def warmup(self, state, prefix_ids: jax.Array):
        return self._warmup(self.params, state, jnp.asarray(prefix_ids, jnp.int32))

    def next_logits(self, state, last_id: jax.Array):
        return self._step(self.params, state, jnp.asarray(last_id, jnp.int32))

    def generate(
        self,
        prompt: str,
        *,
        max_new: int = 400,
        temperature: float = 0.9,
        top_p: float = 0.92,
        top_k: int = 0,
        repetition_penalty: float = 1.25,
        seed: int = 0,
    ) -> str:
        """Full streaming generation loop (host-side sampling, O(K)/token)."""
        from spectral_tpu.train.sampling import apply_top_p

        prefix = list(prompt.encode("utf-8", errors="ignore")) or [32]
        state = self.init_state(batch=1)
        if len(prefix) > 1:
            state = self.warmup(state, np.asarray([prefix[:-1]], np.int32))
        out = prefix[:]
        last = np.asarray([out[-1]], np.int32)
        rng = np.random.default_rng(seed)

        for _ in range(max_new):
            state, logits = self.next_logits(state, last)
            l = np.asarray(logits[0], np.float64)
            for tok in set(out[-256:]):
                l[tok] = l[tok] / repetition_penalty
            l = l / temperature
            if top_p < 1.0:
                l = apply_top_p(l, top_p)
            if top_k and top_k > 0:
                kth = np.sort(l)[-min(top_k, l.shape[0])]
                l = np.where(l < kth, -np.inf, l)
            z = l - l.max()
            p = np.exp(z)
            p /= p.sum()
            nxt = int(rng.choice(256, p=p))
            out.append(nxt)
            last = np.asarray([nxt], np.int32)
        return bytes(out).decode("utf-8", errors="replace")


class DeviceSampler:
    """On-device penalty stack + nucleus sampling (jit/scan-friendly).

    Reproduces train.sampling.penalize_logits/sample_from_logits semantics
    with carried state instead of a Python context list:
      * repetition penalty over a 256-byte ring window (count vector)
      * presence/frequency penalties from the same counts
      * ascii-only + \r bans (static mask)
      * hard anti-stutter (run-length carry)
      * temperature -> top-p -> categorical draw
    """

    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        banned = np.ones(256, np.bool_)
        banned[10] = False
        banned[32:127] = False
        self.ascii_banned = jnp.asarray(banned if cfg.ascii_only else np.zeros(256, np.bool_))
        self.ban_cr = cfg.ban_cr

    @staticmethod
    def _init_state_np(prompt_ids: list[int]) -> dict:
        """Host-side (numpy) sampler state for one prompt."""
        window = ([0] * 256 + list(prompt_ids))[-256:]
        ring = np.asarray(window, np.int32)
        counts = np.zeros(256, np.int32)
        recent = prompt_ids[-256:]
        for b in recent:
            counts[b] += 1
        # account for ring zeros that are padding, not emitted bytes
        pad = 256 - len(recent)
        run_byte = prompt_ids[-1] if prompt_ids else 32
        run_len = 0
        for b in reversed(prompt_ids):
            if b == run_byte:
                run_len += 1
            else:
                break
        return {
            "ring": ring,
            "ring_pos": np.int32(0),
            "counts": counts,
            "pad_left": np.int32(pad),
            "run_byte": np.int32(run_byte),
            "run_len": np.int32(run_len),
        }

    def init_state(self, prompt_ids: list[int]):
        """Carried sampler state seeded from the prompt's recent window."""
        return {k: jnp.asarray(v)
                for k, v in self._init_state_np(prompt_ids).items()}

    def init_state_batch(self, prompts: list):
        """Stacked [M, ...] sampler state for M prompts with ONE
        host->device transfer per leaf.  The per-request ``init_state``
        pays ~6 tiny transfers each; a serving-engine admission round
        (streaming/engine.py) builds all M co-admitted states at once —
        on the tunneled chip each transfer is a host RTT."""
        host = [self._init_state_np(p) for p in prompts]
        return {k: jnp.asarray(np.stack([h[k] for h in host]))
                for k in host[0]}

    def process_logits(self, logits: jax.Array, state: dict) -> jax.Array:
        """[256] raw logits -> penalized, tempered, nucleus-masked logits."""
        cfg = self.cfg
        l = logits.astype(jnp.float32)
        present = state["counts"] > 0
        l = jnp.where(present, l / cfg.repetition_penalty, l)
        if cfg.presence_penalty or cfg.frequency_penalty:
            l = jnp.where(
                present,
                l - cfg.presence_penalty - cfg.frequency_penalty * state["counts"].astype(jnp.float32),
                l,
            )
        l = jnp.where(self.ascii_banned, -jnp.inf, l)
        if self.ban_cr:
            l = l.at[13].set(-jnp.inf)
        stutter = (state["run_len"] >= cfg.max_run_length) & (jnp.arange(256) == state["run_byte"])
        l = jnp.where(stutter, -jnp.inf, l)
        l = l / cfg.temperature
        if cfg.top_p is not None and cfg.top_p < 1.0:
            # sort-free-rank nucleus mask: ONE value sort + a threshold
            # compare, instead of two argsorts + two gathers (the argsort
            # pair dominated the per-token serving cost at fleet batch —
            # argsort is a key/value bitonic sort, ~2x a value sort, and
            # each gather is another full permutation).  Identical to the
            # rank-based mask for distinct logits (ties at the threshold
            # value are all kept — measure-zero for float logits).
            sorted_l = -jnp.sort(-l)  # descending values
            probs = jax.nn.softmax(sorted_l)
            cdf = jnp.cumsum(probs)
            keep_count = jnp.maximum(jnp.sum(cdf <= cfg.top_p), 1)
            thresh = sorted_l[keep_count - 1]
            l = jnp.where(l >= thresh, l, -jnp.inf)
        if cfg.top_k and cfg.top_k > 0:
            kth = jnp.sort(l)[-min(cfg.top_k, 256)]
            l = jnp.where(l < kth, -jnp.inf, l)
        return l

    def draw_and_update(self, rng, logits, state):
        """Sample a byte and advance the carried penalty state."""
        nxt = jax.random.categorical(rng, logits).astype(jnp.int32)
        ring, pos = state["ring"], state["ring_pos"]
        old = ring[pos]
        # the ring's left padding holds placeholder zeros that were never
        # counted; don't decrement while padding remains
        is_pad = state["pad_left"] > 0
        counts = state["counts"]
        counts = jnp.where(
            is_pad, counts, counts.at[old].add(-1)
        )
        counts = counts.at[nxt].add(1)
        new_state = {
            "ring": ring.at[pos].set(nxt),
            "ring_pos": (pos + 1) % 256,
            "counts": counts,
            "pad_left": jnp.maximum(state["pad_left"] - 1, 0),
            "run_byte": nxt,
            "run_len": jnp.where(nxt == state["run_byte"], state["run_len"] + 1, jnp.int32(1)),
        }
        return nxt, new_state


def fir_generate_on_device(
    stream: "FIRStream",
    prompt: str,
    *,
    max_new: int = 400,
    seed: int = 0,
) -> str:
    """Generate max_new bytes in ONE device call: warmup scan + a sampling
    scan carrying (FIR buffers, sampler state, rng) — no per-token host
    round-trips (the TPU-native serving path; the reference loops tokens in
    Python, stream_generate_fast.py:221-234).

    Exactly the B=1 case of ``fir_generate_batch`` (one scan body, one
    compile cache — the two paths cannot drift)."""
    return fir_generate_batch(stream, [prompt], max_new=max_new, seed=seed)[0]


def fir_generate_batch(
    stream: "FIRStream",
    prompts: list,
    *,
    max_new: int = 400,
    seed: int = 0,
) -> list:
    """N concurrent generation streams in ONE device program.

    The TPU-native serving path at batch: the FIR buffers are already
    batched ([B, K, C] per layer) and ``DeviceSampler``'s penalty stack is
    pure jnp over per-stream state, so the whole fleet advances with one
    ``lax.scan`` — B× the throughput of ``fir_generate_on_device`` at
    near-identical wall clock (per-token compute is tiny; the cost is the
    sequential scan itself).  No reference counterpart (the reference
    loops bytes in Python per stream, stream_generate_fast.py:221-234).

    Prompts are left-padded with spaces to a common length for the warmup
    scan; pad bytes age out of the FIR window after ``kernel_len`` tokens
    (documented approximation — the penalty counts use each prompt's TRUE
    bytes only).  Returns the list of decoded strings (prompt + new).
    """
    cfg = stream.cfg
    sampler = DeviceSampler(cfg)
    B = len(prompts)
    encs = [list(p.encode("utf-8", errors="ignore")) or [32] for p in prompts]
    t0 = max(len(e) for e in encs)
    padded = np.full((B, t0), 32, np.int32)
    for i, e in enumerate(encs):
        padded[i, t0 - len(e):] = e

    bufs = stream.init_state(batch=B)
    if t0 > 1:
        bufs = stream.warmup(bufs, padded[:, :-1])
    # one transfer per leaf (see overlap_save_batch: the per-prompt loop
    # cost ~300 ms of fixed RTT at B=32 on the tunneled chip)
    states = sampler.init_state_batch(encs)
    last = jnp.asarray(padded[:, -1], jnp.int32)

    cache = getattr(stream, "_gen_batch_cache", None)
    if cache is None:
        cache = stream._gen_batch_cache = {}
    key = (B, max_new, tuple(sorted(sampler.cfg.to_dict().items())))
    run = cache.get(key)
    if run is None:

        @jax.jit
        def run(params, bufs, states, last_id, rng):
            def body(carry, _):
                bufs, states, last_id, rng = carry
                bufs, logits = stream._step_impl(params, bufs, last_id)
                l = jax.vmap(sampler.process_logits)(logits, states)
                rng, sub = jax.random.split(rng)
                subs = jax.random.split(sub, l.shape[0])
                nxt, states = jax.vmap(sampler.draw_and_update)(subs, l, states)
                return (bufs, states, nxt, rng), nxt

            _, out = jax.lax.scan(body, (bufs, states, last_id, rng), None, length=max_new)
            return out  # [max_new, B]

        cache[key] = run

    out = np.asarray(run(stream.params, bufs, states, last, jax.random.PRNGKey(seed)))
    results = []
    for i, e in enumerate(encs):
        results.append(bytes(e + [int(b) for b in out[:, i]]).decode("utf-8", errors="replace"))
    return results
