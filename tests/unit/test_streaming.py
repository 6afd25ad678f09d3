"""Streaming decoders vs full recompute — the exactness gates.

Exactness map of the overlap-save decoder (full-window update):

* saturated freq gate + constant ctx gate: exact at any depth (the classic
  regime; the conv is a true K-tap causal FIR);
* TRAINED (active) gate stack, single layer: exact — the update feeds the
  full slid window through the same fixed-size transform as training, so
  the newest positions reproduce the training forward bit-for-bit
  (the reference's K-1-sample overlap, generate_chunked_overlap_save.py:
  128-144, is NOT exact here: an active per-bin gate gives the effective
  kernel irfft(k̂·g_freq) a tail beyond K-1 samples);
* active gates, multi-layer: approximate with a BOUNDED drift — the
  training forward itself is weakly alignment-dependent (active freq gates
  add a circular-wraparound tail; the ctx gate re-gates old positions
  retroactively), so cached old hiddens differ from a recompute under the
  slid window.  Entries slide out of the window, so drift does not
  accumulate.

With active frequency gates the FIR path is an approximation by design —
reference stream_generate_fast.py:93-96.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.chunk_head import ChunkLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.streaming.fir import FIRStream
from spectral_tpu.streaming.overlap_save import OverlapSaveStream


def tiny_cfg(**kw):
    base = dict(d_model=32, n_layers=2, seq_len=64, kernel_len=8, jpeg_transition=8, dropout=0.0)
    base.update(kw)
    return TrainConfig(**base)


def make_model(cfg, seed=0, open_freq_gate=True, randomize=True, active_ctx_gate=False):
    model = FixedSpectralLM(cfg)
    x = jnp.zeros((1, cfg.seq_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    if randomize:
        # randomize kernels/gains/ffn so the test is non-trivial; gate
        # treatment is controlled by the two gate flags
        def jitter(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "gate_ctx" in name and not active_ctx_gate:
                return leaf  # zero-init Dense => constant gate
            if "gate_freq" in name:
                return leaf  # handled below
            key = jax.random.PRNGKey(hash(name) % (2**31))
            scale = 0.5 if "gate_ctx" in name else 0.05
            return leaf + scale * jax.random.normal(key, leaf.shape)

        params = jax.tree_util.tree_map_with_path(jitter, params)

    def set_freq(path, leaf):
        if any("gate_freq_logits" == str(getattr(k, "key", k)) for k in path):
            if open_freq_gate:  # saturated: sigmoid(20) ~ 1.0
                return jnp.full_like(leaf, 20.0)
            # trained-like: spread around the +2.0 init, NOT saturated
            return leaf + 0.5 * jax.random.normal(jax.random.PRNGKey(7), leaf.shape)
        return leaf

    params = jax.tree_util.tree_map_with_path(set_freq, params)
    return model, params


def _stream_vs_full(cfg, params, *, chunks=3, chunk_size=8, seed=2):
    """Run init + `chunks` updates; return (h_last_stream, h_last_full, scale)."""
    model = FixedSpectralLM(cfg)
    rng = np.random.default_rng(seed)
    T = cfg.seq_len
    init_ids = rng.integers(0, 256, (1, T)).astype(np.int32)
    stream = OverlapSaveStream(params, cfg)
    state = stream.init_state(init_ids)
    history = list(init_ids[0])
    for _ in range(chunks):
        nb = rng.integers(0, 256, chunk_size).tolist()
        history.extend(nb)
        state = stream.update_chunk(state, nb)
    window = np.asarray([history[-T:]], np.int32)
    h_full = np.asarray(
        model.apply({"params": params}, jnp.asarray(window), method=FixedSpectralLM.forward_hidden)
    )
    return np.asarray(state["h_last"]), h_full[:, -1, :], float(np.abs(h_full[:, -1, :]).max())


class TestFIRStream:
    def test_matches_full_forward(self):
        cfg = tiny_cfg()
        model, params = make_model(cfg)
        rng = np.random.default_rng(0)
        prefix = rng.integers(0, 256, (1, 40)).astype(np.int32)

        full_logits = np.asarray(model.apply({"params": params}, jnp.asarray(prefix)))[0]

        stream = FIRStream(params, cfg)
        state = stream.init_state(batch=1)
        got = []
        for t in range(prefix.shape[1]):
            state, logits = stream.next_logits(state, prefix[:, t])
            got.append(np.asarray(logits[0]))
        got = np.stack(got)  # logits after feeding token t == full logits at pos t
        np.testing.assert_allclose(got, full_logits, rtol=1e-4, atol=1e-4)

    def test_warmup_equals_stepping(self):
        cfg = tiny_cfg()
        model, params = make_model(cfg)
        rng = np.random.default_rng(1)
        prefix = rng.integers(0, 256, (1, 20)).astype(np.int32)

        s1 = FIRStream(params, cfg)
        st = s1.init_state(1)
        st = s1.warmup(st, prefix[:, :-1])
        st, logits_w = s1.next_logits(st, prefix[:, -1])

        st2 = s1.init_state(1)
        for t in range(prefix.shape[1]):
            st2, logits_s = s1.next_logits(st2, prefix[:, t])
        np.testing.assert_allclose(np.asarray(logits_w), np.asarray(logits_s), rtol=1e-5, atol=1e-5)

    def test_generate_smoke(self):
        cfg = tiny_cfg(max_new=16)
        model, params = make_model(cfg)
        stream = FIRStream(params, cfg)
        out = stream.generate("hello", max_new=16, seed=0)
        assert len(out.encode("utf-8", errors="ignore")) >= 16


class TestOverlapSaveStream:
    def test_state_update_matches_full_recompute(self):
        """After init on a T-window and two chunk updates, h_last must equal
        the full forward over the slid window."""
        cfg = tiny_cfg()
        model, params = make_model(cfg)
        rng = np.random.default_rng(2)
        T = cfg.seq_len
        init_ids = rng.integers(0, 256, (1, T)).astype(np.int32)

        stream = OverlapSaveStream(params, cfg)
        state = stream.init_state(init_ids)

        # init h_last must equal the full forward
        h_full = np.asarray(
            model.apply({"params": params}, jnp.asarray(init_ids), method=FixedSpectralLM.forward_hidden)
        )
        np.testing.assert_allclose(np.asarray(state["h_last"]), h_full[:, -1, :], rtol=1e-4, atol=1e-4)

        # two chunks of 8 fixed bytes
        history = list(init_ids[0])
        for c in range(2):
            new_bytes = rng.integers(0, 256, 8).tolist()
            history.extend(new_bytes)
            state = stream.update_chunk(state, new_bytes)

        window = np.asarray([history[-T:]], np.int32)
        h_full2 = np.asarray(
            model.apply({"params": params}, jnp.asarray(window), method=FixedSpectralLM.forward_hidden)
        )
        np.testing.assert_allclose(np.asarray(state["h_last"]), h_full2[:, -1, :], rtol=1e-3, atol=1e-3)

    def test_chunk_head_generation(self):
        cfg = tiny_cfg()
        backbone = FixedSpectralLM(cfg)
        clm = ChunkLM(backbone=backbone, chunk=8)
        x = jnp.zeros((1, cfg.seq_len), jnp.int32)
        params = clm.init(jax.random.PRNGKey(0), x)["params"]
        # ChunkLM nests backbone params under 'backbone'
        stream = OverlapSaveStream(
            params["backbone"], cfg, head_params=params["head"], chunk=8
        )
        out = stream.generate_chunks("once upon", n_chunks=3, seed=0)
        assert len(out.encode("utf-8", errors="replace")) >= 24

    def test_active_gate_stack_single_layer_exact(self):
        """TRAINED gate regime (random non-saturated freq gates + active ctx
        gate), one layer: the full-window update must reproduce the training
        forward to float tolerance.  This is the regime the reference's
        recommended decoder actually runs in after training."""
        cfg = tiny_cfg(n_layers=1)
        _, params = make_model(cfg, open_freq_gate=False, active_ctx_gate=True)
        got, want, _ = _stream_vs_full(cfg, params)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_active_freq_gate_multilayer_bounded_drift(self):
        """Active (non-saturated) freq gates, multi-layer: the training
        forward's wraparound tail makes cached old hiddens alignment-
        dependent, so streaming is approximate — but the drift must stay
        small (entries slide out of the window; nothing accumulates)."""
        cfg = tiny_cfg(n_layers=3)
        _, params = make_model(cfg, open_freq_gate=False, active_ctx_gate=True)
        got, want, scale = _stream_vs_full(cfg, params, chunks=10)
        rel = np.abs(got - want).max() / scale
        assert rel < 3e-2, f"multi-layer active-gate drift {rel:.2e} exceeds bound"

    def test_streaming_cost_independent_of_history(self):
        """The state size must not grow with generated length (O(1) history)."""
        cfg = tiny_cfg()
        model, params = make_model(cfg)
        rng = np.random.default_rng(3)
        stream = OverlapSaveStream(params, cfg)
        state = stream.init_state(rng.integers(0, 256, (1, cfg.seq_len)).astype(np.int32))

        def state_bytes(s):
            return sum(np.asarray(l).nbytes for l in jax.tree.leaves(s))

        before = state_bytes(state)
        for _ in range(5):
            state = stream.update_chunk(state, rng.integers(0, 256, 8).tolist())
        assert state_bytes(state) == before


class TestOnDeviceGeneration:
    def test_process_logits_matches_host_sampler(self):
        """Device penalty stack == numpy penalize_logits + temperature + top-p."""
        from spectral_tpu.streaming.fir import DeviceSampler
        from spectral_tpu.train.sampling import apply_top_p, penalize_logits

        cfg = tiny_cfg(repetition_penalty=1.25, temperature=0.8, top_p=0.9)
        sampler = DeviceSampler(cfg)
        rng = np.random.default_rng(0)
        ctx = [104, 101, 108, 108, 111] * 3  # "hello"x3
        state = sampler.init_state(ctx)
        logits = rng.standard_normal(256).astype(np.float32) * 2

        got = np.asarray(sampler.process_logits(jnp.asarray(logits), state))
        want = penalize_logits(logits, ctx, cfg) / cfg.temperature
        want = apply_top_p(want, cfg.top_p)
        np.testing.assert_array_equal(np.isinf(got), np.isinf(want))
        finite = ~np.isinf(got)
        np.testing.assert_allclose(got[finite], want[finite], rtol=1e-4)

    def test_single_call_generation(self):
        from spectral_tpu.streaming.fir import fir_generate_on_device

        cfg = tiny_cfg(max_run_length=6)
        model, params = make_model(cfg)
        stream = FIRStream(params, cfg)
        out = fir_generate_on_device(stream, "hello world", max_new=32, seed=1)
        body = out.encode("utf-8", errors="ignore")
        assert len(body) >= 32 + 11
        for b in body:
            assert b == 10 or (32 <= b <= 126)  # ascii_only enforced on device


    def test_batched_generation(self):
        """fir_generate_batch: N streams in one scan — per-stream results
        are deterministic and ascii-clean, each continuing its own prompt."""
        from spectral_tpu.streaming.fir import fir_generate_batch

        cfg = tiny_cfg(max_run_length=6)
        model, params = make_model(cfg)
        stream = FIRStream(params, cfg)
        prompts = ["hello world", "def main():", "import os"]
        outs = fir_generate_batch(stream, prompts, max_new=24, seed=3)
        assert len(outs) == 3
        for p, o in zip(prompts, outs):
            assert o.startswith(p)
            body = o.encode("utf-8", errors="ignore")
            assert len(body) >= len(p) + 24
            for b in body:
                assert b == 10 or (32 <= b <= 126)
        outs2 = fir_generate_batch(stream, prompts, max_new=24, seed=3)
        assert outs == outs2  # deterministic

    def test_anti_stutter_on_device(self):
        """Force a degenerate model (constant logits favoring one byte) and
        check the run-length ban caps repeats at max_run_length."""
        from spectral_tpu.streaming.fir import DeviceSampler

        cfg = tiny_cfg(max_run_length=4, top_p=1.0, repetition_penalty=1.0, temperature=1.0)
        sampler = DeviceSampler(cfg)
        state = sampler.init_state([65])
        logits = jnp.full((256,), -20.0).at[65].set(20.0).at[66].set(10.0)
        rng = jax.random.PRNGKey(0)
        seq = []
        for i in range(12):
            l = sampler.process_logits(logits, state)
            rng, sub = jax.random.split(rng)
            nxt, state = sampler.draw_and_update(sub, l, state)
            seq.append(int(nxt))
        # never more than max_run_length consecutive 65s
        run, max_run = 0, 0
        prev = 65
        for b in [65] + seq:
            run = run + 1 if b == prev else 1
            prev = b
            max_run = max(max_run, run)
        assert max_run <= cfg.max_run_length


class TestOverlapSaveBatch:
    """Batched EXACT decoder (streaming/overlap_save_batch.py): per-token
    logits must equal OverlapSaveStream(chunk=1) — same algorithm, tap-dot
    instead of window FFT — and the full forward at init."""

    def _setup(self, n_layers=2, **gates):
        cfg = tiny_cfg(n_layers=n_layers)
        model, params = make_model(cfg, **gates)
        return cfg, model, params

    def test_init_matches_full_forward(self):
        from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

        cfg, model, params = self._setup(open_freq_gate=False, active_ctx_gate=True)
        rng = np.random.default_rng(11)
        ids = rng.integers(0, 256, (3, cfg.seq_len)).astype(np.int32)
        dec = OverlapSaveBatch(params, cfg)
        _, logits = dec.init_state(ids)
        ref = np.asarray(model.apply({"params": params}, jnp.asarray(ids), deterministic=True))
        np.testing.assert_allclose(np.asarray(logits), ref[:, -1, :], rtol=1e-4, atol=1e-4)

    def test_fused_prefill_matches_flax_prefill(self):
        """Round-4 (VERDICT r3 next #2): the fused-kernel prefill route must
        produce the same per-block pre-norm buffers AND logits as the flax
        jnp.fft prefill (interpret mode, fp32) — serving is prefill-bound
        and the init forward is where the time goes."""
        from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

        cfg, model, params = self._setup(open_freq_gate=False, active_ctx_gate=True)
        rng = np.random.default_rng(21)
        ids = rng.integers(0, 256, (3, cfg.seq_len)).astype(np.int32)

        flax_dec = OverlapSaveBatch(params, cfg, prefill_backend="flax")
        fused_dec = OverlapSaveBatch(params, cfg, prefill_backend="fused")
        assert fused_dec._fused_prefill and not flax_dec._fused_prefill
        state_f, logits_f = flax_dec.init_state(ids)
        state_k, logits_k = fused_dec.init_state(ids)
        for i, (a, b) in enumerate(zip(state_k[0], state_f[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"layer {i} pre-norm buffer")
        np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits_f),
                                   rtol=1e-4, atol=1e-4)

        # decode continues identically from either prefill
        nxt = np.asarray([65, 66, 67], np.int32)
        _, lf = flax_dec.next_logits(state_f, nxt)
        _, lk = fused_dec.next_logits(state_k, nxt)
        np.testing.assert_allclose(np.asarray(lk), np.asarray(lf),
                                   rtol=2e-4, atol=2e-4)

    def test_token_steps_match_single_stream_chunk1(self):
        """Trained-like gates, multi-layer: the batched tap-dot decoder and
        the single-stream full-window-FFT decoder are the SAME algorithm —
        their per-token hidden states must agree to float tolerance."""
        from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

        cfg, model, params = self._setup(open_freq_gate=False, active_ctx_gate=True)
        rng = np.random.default_rng(12)
        T = cfg.seq_len
        init_ids = rng.integers(0, 256, (1, T)).astype(np.int32)

        single = OverlapSaveStream(params, cfg)
        s_state = single.init_state(init_ids)
        batch = OverlapSaveBatch(params, cfg)
        b_state, b_logits = batch.init_state(init_ids)

        np.testing.assert_allclose(
            np.asarray(b_logits),
            np.asarray(single.tied_last_logits(s_state)), rtol=1e-4, atol=1e-4)

        for t in range(6):
            nb = int(rng.integers(0, 256))
            s_state = single.update_chunk(s_state, [nb])
            b_state, b_logits = batch.next_logits(b_state, np.asarray([nb], np.int32))
            np.testing.assert_allclose(
                np.asarray(b_logits),
                np.asarray(single.tied_last_logits(s_state)),
                rtol=2e-4, atol=2e-4, err_msg=f"token {t}")

    def test_batched_streams_match_independent_runs(self):
        """Three concurrent streams must produce the same logits as three
        independent single-stream runs (no cross-stream leakage)."""
        from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

        cfg, model, params = self._setup(open_freq_gate=False, active_ctx_gate=True)
        rng = np.random.default_rng(13)
        T = cfg.seq_len
        ids = rng.integers(0, 256, (3, T)).astype(np.int32)
        toks = rng.integers(0, 256, (4, 3)).astype(np.int32)

        dec = OverlapSaveBatch(params, cfg)
        state, logits = dec.init_state(ids)
        got = [np.asarray(logits)]
        for t in range(4):
            state, logits = dec.next_logits(state, toks[t])
            got.append(np.asarray(logits))

        for j in range(3):
            state1, l1 = dec.init_state(ids[j:j+1])
            np.testing.assert_allclose(got[0][j], np.asarray(l1)[0], rtol=2e-4, atol=2e-4)
            for t in range(4):
                state1, l1 = dec.next_logits(state1, toks[t, j:j+1])
                np.testing.assert_allclose(
                    got[t + 1][j], np.asarray(l1)[0], rtol=2e-4, atol=2e-4,
                    err_msg=f"stream {j} token {t}")

    def test_bf16_buffers_track_fp32(self):
        """buf_dtype='bfloat16' (halved window-read traffic for fleet
        serving) must stay within default-matmul-precision error class of
        the exact fp32 decoder — bf16-rounded tap-dot inputs, fp32
        accumulation, everything downstream fp32."""
        from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

        cfg, model, params = self._setup(open_freq_gate=False, active_ctx_gate=True)
        rng = np.random.default_rng(14)
        ids = rng.integers(0, 256, (2, cfg.seq_len)).astype(np.int32)
        toks = rng.integers(0, 256, (5, 2)).astype(np.int32)

        ref = OverlapSaveBatch(params, cfg)
        fast = OverlapSaveBatch(params, cfg, buf_dtype="bfloat16")
        assert fast.buf_dtype == jnp.bfloat16
        s_ref, l_ref = ref.init_state(ids)
        s_fast, l_fast = fast.init_state(ids)
        assert all(b.dtype == jnp.bfloat16 for b in s_fast[0])
        for t in range(5):
            s_ref, l_ref = ref.next_logits(s_ref, toks[t])
            s_fast, l_fast = fast.next_logits(s_fast, toks[t])
            scale = np.maximum(np.abs(np.asarray(l_ref)), 1.0)
            err = np.max(np.abs(np.asarray(l_fast) - np.asarray(l_ref)) / scale)
            assert err < 3e-2, f"token {t}: bf16 buffer rel err {err:.2e}"

    def test_generate_batch_smoke_and_determinism(self):
        from spectral_tpu.streaming.overlap_save_batch import (
            OverlapSaveBatch,
            overlap_save_generate_batch,
        )

        cfg, model, params = self._setup(open_freq_gate=False, active_ctx_gate=True)
        dec = OverlapSaveBatch(params, cfg)
        prompts = ["once upon a time", "def main():"]
        a = overlap_save_generate_batch(dec, prompts, max_new=12, seed=5)
        b = overlap_save_generate_batch(dec, prompts, max_new=12, seed=5)
        assert a == b
        assert all(len(s.encode("utf-8", errors="replace")) >= len(p.encode()) + 12
                   for s, p in zip(a, prompts))
