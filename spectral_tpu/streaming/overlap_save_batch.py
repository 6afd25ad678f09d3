"""Batched EXACT streaming decode: N overlap-save streams, one jitted scan.

Reference: scripts/generate_chunked_overlap_save.py:78-206 — the reference
README's *recommended* (exact) decoder, which its torch implementation can
only run one stream at a time with a Python chunk loop.  This module serves
N streams concurrently with the FULL gate stack (per-frequency gate,
sliding-window context gate, per-channel gain) — the exactness
``fir_generate_batch`` gives up (it drops the frequency gate and
approximates the context gate; streaming/fir.py:10-15).

The O(T·C)-per-token trick (why this is cheap enough to serve):
the training conv at the NEWEST position t reduces to a dot over the
sliding window —

    y[t] = sum_{tau=0}^{T-1} h_time[tau] * xn[t - tau]

because (a) taps tau >= T cannot reach position t inside a T-long window
(x is zero-padded beyond it in training), and (b) the circular wrap taps
of the causal_taps=False variant only land on EARLIER rows of the Toeplitz
operator, never the last one.  So per token per layer the decoder needs ONE
read of the [N, T, C] pre-norm window — no FFT, no (T, T) matrix — and the
context-gate window mean rides the SAME read (a second row in the einsum).
Buffers are circular (one [N, 1, C] write/slot, rotated tap vector) like
the FIR fleet's — no sliding copies.

Exactness gate: tests/unit/test_streaming.py::TestOverlapSaveBatch — per
token logits equal OverlapSaveStream(chunk=1) and the full forward's last
position at fp32 tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.ops.fftc import causal_filter_taps, conv_n_fft
from spectral_tpu.streaming.fir import DeviceSampler, _ffn, _layernorm

# (cfg, buf_dtype, prefill route) -> {"init": jitted, "step": jitted}
# shared across OverlapSaveBatch instances — see __init__
_SHARED_JITS: dict = {}


class OverlapSaveBatch:
    """Exact N-stream decoder over a trained FixedSpectralLM param tree.

    Weight-tied next-byte logits (the flagship artifact path).  All state
    is batched: per-layer circular pre-norm windows [N, T, C] + one write
    pointer.  ``seq_len`` is the sliding window length (cfg.seq_len).
    """

    def __init__(self, params: dict, cfg: TrainConfig,
                 buf_dtype: str = "float32", prefill_backend: str = "auto"):
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.n_layers = cfg.n_layers
        self.T = cfg.seq_len
        self.kernel_len = cfg.kernel_len
        self.causal_taps = getattr(cfg, "causal_taps", True)
        self.n_fft = conv_n_fft(cfg.seq_len, cfg.kernel_len)
        # Serving is PREFILL-bound (experiments/profile_decode): route the
        # init forward through the fused Pallas block kernels on TPU
        # ("auto"); the per-block pre-norm buffers the decode scan needs
        # are recovered by recomputing LN1 from each block's input —
        # positionwise, cheap (VERDICT r3 next #2).  "flax" forces the
        # original jnp.fft prefill; "fused" forces the kernel route
        # (interpret mode off-TPU — parity tests).
        if prefill_backend not in ("auto", "fused", "flax"):
            raise ValueError(f"prefill_backend={prefill_backend!r}")
        self.prefill_backend = prefill_backend
        self._fused_prefill = self._pick_fused_prefill(prefill_backend)
        # "bfloat16" stores the [N, T, C] windows in bf16 (fp32
        # accumulation in the tap-dot, everything downstream fp32) at
        # default-matmul-precision error class.  Measured history: under
        # the r3 engine-global write pointer, chip A/B showed NO speedup
        # at d512x6 fleet shapes; AFTER the per-lane-phase fix the same
        # A/B flipped — bf16 windows 61.4K vs fp32 42.3K bytes/s at B=32
        # (1.45x, BENCHMARKS.md round-4 amendment).  float32 remains the
        # default because it is the configuration the BIT-exact admission
        # invariance guarantee is stated and gated under; bf16 is the
        # measured fast option (invariance coverage for bf16: see
        # STREAMING.md serving guarantees).
        self.buf_dtype = jnp.dtype(buf_dtype)
        # taps depend only on params (fixed per decoder): computed ONCE
        # here, not per token — next_logits previously re-ran n_layers
        # rfft+irfft transforms inside every per-token dispatch
        self.taps_list = [self._layer_taps(self.params[f"block_{i}"])
                          for i in range(self.n_layers)]
        # Jitted programs are SHARED across decoder instances with the
        # same (cfg, buf_dtype, prefill route): a fresh jax.jit wrapper
        # per instance re-traces and re-compiles every program — on the
        # tunneled chip each remote compile is seconds-to-minutes, and a
        # serving benchmark constructing one engine per rep measured
        # 3-23 s "steps" that were nothing but recompiles of identical
        # programs.  The impls take params AND taps as arguments, so the
        # trace has no instance-specific constants.  The cached jits bind
        # to a PARAMS-FREE config twin, not this instance: a bound-method
        # jit pins its instance for the process lifetime, which kept the
        # first decoder's device-resident param tree alive (r4 advisor).
        jkey = (tuple(sorted(cfg.to_dict().items())), str(self.buf_dtype),
                self._fused_prefill)
        progs = _SHARED_JITS.setdefault(jkey, {})
        if "init" not in progs:
            twin = self.config_twin()
            progs["init"] = jax.jit(twin._init_impl)
            progs["step"] = jax.jit(twin._step_impl)
        self._init_fn = progs["init"]
        self._step = progs["step"]

    def config_twin(self) -> "OverlapSaveBatch":
        """Shallow copy with the device-resident state (params, taps)
        dropped.  The jitted impls take params/taps as ARGUMENTS, so a
        twin-bound program is trace-identical while the shared cache holds
        only config-sized host state."""
        import copy

        twin = copy.copy(self)
        twin.params = None
        twin.taps_list = None
        return twin

    # -- filter taps --------------------------------------------------------

    def _layer_taps(self, bp: dict) -> jax.Array:
        """First-T time taps of the block's fused eval-time filter
        irfft(k̂·sigmoid(gate_freq)) (+ causal projection) — all the conv
        memory the newest position can see (module docstring)."""
        n_fft = self.n_fft
        fbins = n_fft // 2 + 1
        k = jnp.pad(bp["kernel"].astype(jnp.float32), (0, n_fft - self.kernel_len))
        k_freq = jnp.fft.rfft(k)
        h = k_freq * jax.nn.sigmoid(bp["gate_freq_logits"][:fbins])
        if self.causal_taps:  # must mirror training (models/backbone.py)
            h = causal_filter_taps(h, n_fft, n_fft - self.T)
        h_time = jnp.fft.irfft(h, n=n_fft)
        return h_time[: self.T].astype(jnp.float32)

    # -- init: full forward over the padded window --------------------------

    def _block_full(self, bp: dict, h: jax.Array):
        """Full-window block forward (init only); returns (h_out, ln_in).
        Same math as OverlapSaveStream._block_full, batched over N."""
        N, T, C = h.shape
        ln_in = _layernorm(h, bp["ln"]["scale"], bp["ln"]["bias"])
        n_fft = self.n_fft
        fbins = n_fft // 2 + 1
        x_pad = jnp.pad(ln_in, ((0, 0), (0, n_fft - T), (0, 0)))
        x_freq = jnp.fft.rfft(x_pad, axis=1)
        k = jnp.pad(bp["kernel"], (0, n_fft - self.kernel_len))
        k_freq = jnp.fft.rfft(k)
        hfil = k_freq * jax.nn.sigmoid(bp["gate_freq_logits"][:fbins])
        if self.causal_taps:
            hfil = causal_filter_taps(hfil, n_fft, n_fft - T)
        pooled = jnp.mean(ln_in, axis=1)
        g_ctx = jax.nn.sigmoid(pooled @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        y_freq = x_freq * hfil[None, :, None] * (bp["gain"][None, :] * g_ctx)[:, None, :]
        y = jnp.fft.irfft(y_freq, n=n_fft, axis=1)[:, :T, :]
        return _ffn(bp["ffn"], h + y), ln_in

    def _pick_fused_prefill(self, backend: str) -> bool:
        """Decide ONCE (jit-external) whether the init forward runs the
        fused kernels.  "auto" requires a real TPU (interpret mode would be
        slower than the jnp path), a Mosaic-aligned width, and a fused
        route covering (T, C, H)."""
        if backend == "flax":
            return False
        from spectral_tpu.models.fused_apply import fused_path_for

        C = self.cfg.d_model
        H = self.params["block_0"]["ffn"]["ffn_in"]["kernel"].shape[1]
        covered = fused_path_for(self.T, C, H) is not None
        if backend == "fused":
            return covered
        return (covered and jax.default_backend() == "tpu"
                and C % 128 == 0 and self.T % 8 == 0)

    def _init_impl(self, params, x_ids):
        """x_ids [N, T] -> (bufs, ptrs, ws, logits).  Buffer slot j holds
        window position j; lane n's next write overwrites its slot
        ``ptrs[n]`` (initially 0, the oldest).

        Per-lane phase (round 4): ``ptrs`` is [N] and each lane carries
        its own rotated tap row ``ws[l][n]`` — so a lane's buffer layout
        (and therefore the fp REDUCTION ORDER of the conv dot) is
        identical to a solo run at every decode step, no matter when the
        engine admitted it.  With the previous engine-global ptr, a lane
        admitted at phase p had its window rotated by p: exact in real
        arithmetic, but the rotated accumulation order perturbs logits at
        the 1e-6 class, which the nucleus mask occasionally amplifies
        into a flipped sampled byte (chip-reproduced: 1 byte in a
        20-token probe under a busy Poisson run).  Bit-exact admission
        invariance is restored by never sharing a phase."""
        h = params["embed"]["embedding"][x_ids]
        bufs = []
        for i in range(self.n_layers):
            bp = params[f"block_{i}"]
            if self._fused_prefill:
                # fused route: ONE Pallas program per block (seq<=2048: the
                # whole-block kernel; longer: conv + fused tail) instead of
                # ~15 XLA fusions; the decode scan's pre-norm buffer is
                # LN1(h), recomputed here positionwise.  fp32 in-kernel
                # dots (Mosaic accurate mode) — prefill parity gate:
                # tests/unit/test_streaming.py::test_fused_prefill_*.
                from spectral_tpu.models.fused_apply import (
                    fused_block_apply,
                    fused_block_apply_tail,
                    fused_path_for,
                )

                ln_in = _layernorm(h, bp["ln"]["scale"], bp["ln"]["bias"])
                C = h.shape[-1]
                H = bp["ffn"]["ffn_in"]["kernel"].shape[1]
                kw = dict(kernel_len=self.kernel_len,
                          transition_bins=self.cfg.jpeg_transition,
                          deterministic=True, causal_taps=self.causal_taps,
                          compute_dtype="float32")
                if fused_path_for(self.T, C, H) == "block":
                    h = fused_block_apply(bp, h, None, **kw)
                else:
                    h = fused_block_apply_tail(bp, h, None, **kw)
            else:
                h, ln_in = self._block_full(bp, h)
            bufs.append(ln_in.astype(self.buf_dtype))
        h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        h_last = h[:, -1, :]
        # precision=HIGHEST (round-5 invariance finding): at DEFAULT, XLA
        # lowers this matmul to a VPU fp32 matvec at M=1 but an MXU bf16
        # GEMM at M>1 — a 1.3e-3-relative logit difference between a solo
        # prefill and a batched admission round (window BUFFERS are
        # bit-identical across M; chip probe /tmp/probe_prefill.py).  A
        # knife-edge nucleus decision then flips the first sampled byte
        # (chip-reproduced: 1 req in 256 at decode-heavy shape).  HIGHEST
        # pins both to fp32; cross-program variance drops to fp32
        # accumulation-order class (1e-7).  Cost: one tiny [M, C] x
        # [C, 256] matmul per admission.
        logits = jnp.matmul(h_last, params["embed"]["embedding"].T,
                            precision=jax.lax.Precision.HIGHEST)
        N, T = x_ids.shape
        ptrs = jnp.zeros((N,), jnp.int32)
        # lane tap rows at phase 0: w0[j] = taps[(0 - j) mod T] reversed-
        # rolled; each decode step rolls every row by +1 (cheap [N, T]
        # slice-concat) instead of re-deriving from a shared ptr
        ws = [jnp.broadcast_to(
                  jnp.roll(self._layer_taps(params[f"block_{i}"])[::-1], 1),
                  (N, T))
              for i in range(self.n_layers)]
        return bufs, ptrs, ws, logits

    # -- per-token step ------------------------------------------------------

    def _block_token(self, bp: dict, w: jax.Array, x_t: jax.Array,
                     buf: jax.Array, ptrs):
        """One token through one block.  x_t [N, C], buf [N, T, C] circular
        with PER-LANE write phase ``ptrs`` [N]; ``w`` [N, T] is each lane's
        tap row already rotated to its own phase (carried in state).

        Writes this token's pre-norm activation at each lane's own slot,
        then computes conv-dot AND window mean in ONE buffer read:
        R_n = [w_n; 1/T], res = einsum('ntc,nrt->nrc', buf, R).
        """
        T = self.T
        xn = _layernorm(x_t, bp["ln"]["scale"], bp["ln"]["bias"])
        # row scatter, NOT vmapped dynamic_update_slice: the vmapped form
        # lowers out-of-place (a full [N, T, C] copy per layer per token,
        # chip-measured +0.31 ms/token at the fleet shape); .at[].set
        # scatters in place on the scan carry
        buf = buf.at[jnp.arange(buf.shape[0]), ptrs].set(
            xn.astype(buf.dtype))
        R = jnp.stack(
            [w, jnp.full_like(w, 1.0 / T)], axis=1)  # [N, 2, T]
        res = jnp.einsum("ntc,nrt->nrc", buf, R.astype(buf.dtype),
                         preferred_element_type=jnp.float32)
        y_raw, pooled = res[:, 0, :], res[:, 1, :]
        g_ctx = jax.nn.sigmoid(pooled @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        y = y_raw * (bp["gain"][None, :] * g_ctx)
        return _ffn(bp["ffn"], x_t + y), buf

    def _token_step(self, params, state, x_id):
        bufs, ptrs, ws = state
        h = params["embed"]["embedding"][x_id]
        new_bufs = []
        for i in range(self.n_layers):
            h, b = self._block_token(params[f"block_{i}"], ws[i], h,
                                     bufs[i], ptrs)
            new_bufs.append(b)
        h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        # HIGHEST for the same cross-program stability (solo N=1 engines
        # vs fleet N=32 — see _init_impl note); negligible vs the window
        # reads that dominate the step (profile_decode roofline).
        logits = jnp.matmul(h, params["embed"]["embedding"].T,
                            precision=jax.lax.Precision.HIGHEST)
        # advance every lane's phase; the tap rows rotate with it
        ptrs = (ptrs + 1) % self.T
        ws = [jnp.roll(w, 1, axis=-1) for w in ws]
        return (new_bufs, ptrs, ws), logits

    def _step_impl(self, params, state, x_id):
        # state carries taps (ws) and per-lane phases — no closure
        # constants, so the jitted program is instance-independent
        # (_SHARED_JITS)
        return self._token_step(params, state, x_id)

    # -- public API ----------------------------------------------------------

    def init_state(self, context_ids) -> tuple:
        """context_ids [N, T] int32 (left-pad to seq_len upstream).
        Returns ((bufs, ptrs, ws), logits_for_last_context_position)."""
        bufs, ptrs, ws, logits = self._init_fn(
            self.params, jnp.asarray(context_ids, jnp.int32))
        return (bufs, ptrs, ws), logits

    def next_logits(self, state, last_id):
        """last_id [N] int32 -> (state, [N, 256] tied logits)."""
        return self._step(self.params, state, jnp.asarray(last_id, jnp.int32))


def overlap_save_generate_batch(
    decoder: OverlapSaveBatch,
    prompts: list,
    *,
    max_new: int = 400,
    seed: int = 0,
) -> list:
    """N exact concurrent streams in ONE device program (scan over tokens).

    The exact counterpart of ``fir_generate_batch`` (streaming/fir.py):
    same DeviceSampler penalty stack, same one-scan structure, but the full
    training-forward gate math per token.  Prompts are LEFT-padded with
    spaces to the model's seq_len window (the overlap-save window must be
    full; reference generate_chunked_overlap_save.py pads the same way).
    Returns decoded strings (prompt + new bytes).
    """
    cfg = decoder.cfg
    sampler = DeviceSampler(cfg)
    N = len(prompts)
    T = decoder.T
    encs = [list(p.encode("utf-8", errors="ignore")) or [32] for p in prompts]
    padded = np.full((N, T), 32, np.int32)
    for i, e in enumerate(encs):
        tail = e[-T:]
        padded[i, T - len(tail):] = tail

    # the init forward already consumes every prompt byte (the window holds
    # them all); the first sampled byte continues from the last prompt byte
    state, logits0 = decoder.init_state(padded)
    # ONE host->device transfer per sampler-state leaf (the per-prompt
    # init_state loop paid ~6 tiny RTT-bound transfers per stream: ~300 ms
    # of the B=32 fleet's fixed cost on the tunneled chip — round-4
    # attribution, BENCHMARKS.md "exact fleet fixed-cost")
    states = sampler.init_state_batch(encs)

    cache = getattr(decoder, "_gen_batch_cache", None)
    if cache is None:
        cache = decoder._gen_batch_cache = {}
    key = (N, max_new, tuple(sorted(sampler.cfg.to_dict().items())))
    run = cache.get(key)
    if run is None:

        @jax.jit
        def run(params, state, samp_states, logits0, rng):
            # taps ride in state (per-lane rotated rows, init_state)

            def body(carry, _):
                state, samp_states, logits, rng = carry
                l = jax.vmap(sampler.process_logits)(logits, samp_states)
                rng, sub = jax.random.split(rng)
                subs = jax.random.split(sub, l.shape[0])
                nxt, samp_states = jax.vmap(sampler.draw_and_update)(subs, l, samp_states)
                state, logits = decoder._token_step(params, state, nxt)
                return (state, samp_states, logits, rng), nxt

            _, out = jax.lax.scan(body, (state, samp_states, logits0, rng), None, length=max_new)
            return out  # [max_new, N]

        cache[key] = run

    out = np.asarray(run(decoder.params, state, states, logits0, jax.random.PRNGKey(seed)))
    results = []
    for i, e in enumerate(encs):
        results.append(bytes(e + [int(b) for b in out[:, i]]).decode("utf-8", errors="replace"))
    return results
