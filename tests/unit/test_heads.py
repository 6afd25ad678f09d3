"""Head zoo tests: SpectralEMA golden parity, chunk head, aux heads + labels."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.chunk_head import ChunkLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.models.dual_head import TokenAwareChunkLM, compute_dual_loss
from spectral_tpu.models.phase_clock import (
    PhaseClockChunkLM,
    compute_phase_clock_loss,
    generate_phase_targets,
)
from spectral_tpu.models.segmentation_head import (
    SegmentedChunkLM,
    compute_segmented_loss,
    get_word_boundaries,
)
from spectral_tpu.models.spectral_ssm import SpectralEMA


def tiny_cfg(**kw):
    base = dict(d_model=32, n_layers=1, seq_len=64, kernel_len=16, jpeg_transition=8, dropout=0.0)
    base.update(kw)
    return TrainConfig(**base)


def _torch_ema_update(state, chunk, rho_logit, theta_raw, mode):
    """Fresh torch oracle of the reference update equations (spectral_ssm.py:71-105)."""
    rho = torch.sigmoid(torch.tensor(rho_logit))
    theta = np.pi * torch.tanh(torch.tensor(theta_raw))
    a = (rho * torch.exp(1j * theta)).to(torch.complex64)
    omr = (1.0 - rho).to(torch.float32)
    state = torch.tensor(state)
    chunk = torch.tensor(chunk)
    if mode == "polar":
        m_new = rho.unsqueeze(0) * state.abs() + omr.unsqueeze(0) * chunk.abs()
        phi = torch.angle(chunk)
        return (m_new.to(torch.complex64) * torch.exp(1j * phi).to(torch.complex64)).numpy()
    rot = torch.exp(1j * (torch.angle(chunk) - torch.angle(state))).to(torch.complex64)
    return (a.unsqueeze(0) * (state * rot) + omr.unsqueeze(0).to(torch.complex64) * chunk).numpy()


class TestSpectralEMA:
    def _params(self, F, rho_logit, theta_raw):
        return {"params": {"rho_logit": jnp.asarray(rho_logit), "theta_raw": jnp.asarray(theta_raw)}}

    def test_update_matches_torch(self):
        rng = np.random.default_rng(0)
        B, F = 3, 9
        rho_logit = rng.standard_normal(F).astype(np.float32)
        theta_raw = rng.standard_normal(F).astype(np.float32)
        state = (rng.standard_normal((B, F)) + 1j * rng.standard_normal((B, F))).astype(np.complex64)
        chunk = (rng.standard_normal((B, F)) + 1j * rng.standard_normal((B, F))).astype(np.complex64)
        for mode in ("aligned", "polar"):
            ema = SpectralEMA(n_freqs=F, mode=mode)
            got = np.asarray(
                ema.apply(self._params(F, rho_logit, theta_raw), jnp.asarray(state), jnp.asarray(chunk),
                          method=SpectralEMA.update)
            )
            want = _torch_ema_update(state, chunk, rho_logit, theta_raw, mode)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_scan_equals_sequential_updates(self):
        rng = np.random.default_rng(1)
        B, S, F = 2, 7, 5
        chunks = (rng.standard_normal((B, S, F)) + 1j * rng.standard_normal((B, S, F))).astype(np.complex64)
        ema = SpectralEMA(n_freqs=F)
        params = ema.init(jax.random.PRNGKey(0), jnp.asarray(chunks))
        final = np.asarray(ema.apply(params, jnp.asarray(chunks)))
        state = np.zeros((B, F), np.complex64)
        for t in range(S):
            state = np.asarray(
                ema.apply(params, jnp.asarray(state), jnp.asarray(chunks[:, t]), method=SpectralEMA.update)
            )
        np.testing.assert_allclose(final, state, rtol=1e-5, atol=1e-5)

    def test_stability(self):
        """rho in (0,1): state magnitude stays bounded over a long scan."""
        rng = np.random.default_rng(2)
        B, S, F = 1, 500, 4
        chunks = (rng.standard_normal((B, S, F)) + 1j * rng.standard_normal((B, S, F))).astype(np.complex64)
        ema = SpectralEMA(n_freqs=F, rho_init=0.99)
        params = ema.init(jax.random.PRNGKey(0), jnp.asarray(chunks))
        final = np.asarray(ema.apply(params, jnp.asarray(chunks)))
        assert np.isfinite(final).all()
        assert np.abs(final).max() < 100


class TestChunkLM:
    def test_shapes_and_grads(self):
        cfg = tiny_cfg()
        backbone = FixedSpectralLM(cfg)
        model = ChunkLM(backbone=backbone, chunk=8, use_ema=True)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(params, x, cutoff=jnp.int32(16))
        assert logits.shape == (2, 8, 256)
        names = " ".join(
            "/".join(str(getattr(k, "key", k)) for k in p)
            for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        )
        assert "ema" in names and "rho_logit" in names

        def loss(p):
            return jnp.sum(model.apply(p, x, cutoff=jnp.int32(16)) ** 2)

        g = jax.grad(loss)(params)
        # EMA params must receive gradient through the complex scan
        g_rho = g["params"]["ema"]["rho_logit"]
        assert float(jnp.linalg.norm(g_rho)) > 0

    def test_no_ema_variant(self):
        cfg = tiny_cfg()
        model = ChunkLM(backbone=FixedSpectralLM(cfg), chunk=4, use_ema=False)
        x = jnp.zeros((1, 64), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)
        assert "ema" not in params["params"]
        assert model.apply(params, x).shape == (1, 4, 256)


class TestAuxHeads:
    def test_word_boundaries_match_reference_example(self):
        text = "The cat sat."
        x = np.asarray([[ord(c) for c in text]])
        b = get_word_boundaries(x)[0]
        # reference self-test expectation (segmentation_head.py:210)
        assert b.tolist() == [0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 1]

    def test_phase_targets_match_torch_reference_loop(self):
        """Vectorized phase targets vs a fresh loop implementation of the
        reference algorithm (phase_clock.py:68-115)."""

        def torch_ref(text_bytes):
            B, T = text_bytes.shape
            targets = torch.zeros(B, T, 2)
            for b in range(B):
                i = 0
                while i < T:
                    v = int(text_bytes[b, i])
                    if v == 32 or (33 <= v <= 47) or (58 <= v <= 64):
                        i += 1
                        continue
                    j = i
                    while j < T:
                        nv = int(text_bytes[b, j])
                        if nv == 32 or (33 <= nv <= 47) or (58 <= nv <= 64):
                            break
                        j += 1
                    wl = j - i
                    if wl > 0:
                        ang = torch.linspace(0, np.pi, wl)
                        targets[b, i:j, 0] = torch.cos(ang)
                        targets[b, i:j, 1] = torch.sin(ang)
                    i = j
            return targets.numpy()

        rng = np.random.default_rng(3)
        texts = [
            "The cat sat on the mat.",
            "a bb ccc dddd!  x",
            "   leading spaces",
            "word",
        ]
        for t in texts:
            x = np.asarray([[ord(c) for c in t]])
            np.testing.assert_allclose(generate_phase_targets(x), torch_ref(torch.tensor(x)), atol=1e-6)
        x = rng.integers(32, 127, (4, 80))
        np.testing.assert_allclose(generate_phase_targets(x), torch_ref(torch.tensor(x)), atol=1e-6)

    def test_segmented_chunk_lm(self):
        cfg = tiny_cfg()
        model = SegmentedChunkLM(backbone=FixedSpectralLM(cfg), chunk=8)
        x = jnp.asarray(np.random.default_rng(0).integers(32, 127, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)
        char_logits, seg_logits = model.apply(params, x)
        assert char_logits.shape == (2, 8, 256) and seg_logits.shape == (2, 64)
        y = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)).astype(np.int32))
        seg_t = jnp.asarray(get_word_boundaries(np.asarray(x)))
        total, cl, sl = compute_segmented_loss(char_logits, seg_logits, y, seg_t)
        assert np.isfinite(float(total))
        # zero-init seg head => logits 0 => BCE = log(2)
        np.testing.assert_allclose(float(sl), np.log(2), rtol=1e-5)

    def test_phase_clock_chunk_lm(self):
        cfg = tiny_cfg()
        model = PhaseClockChunkLM(backbone=FixedSpectralLM(cfg), chunk=8)
        x = jnp.asarray(np.random.default_rng(0).integers(32, 127, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)
        char_logits, phase = model.apply(params, x)
        assert phase.shape == (2, 64, 2)
        y = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)).astype(np.int32))
        pt = jnp.asarray(generate_phase_targets(np.asarray(x)))
        total, cl, pl = compute_phase_clock_loss(char_logits, phase, y, pt)
        assert np.isfinite(float(total))

    def test_dual_head_and_masked_token_loss(self):
        cfg = tiny_cfg()
        model = TokenAwareChunkLM(backbone=FixedSpectralLM(cfg), chunk=8, token_vocab_size=128)
        x = jnp.asarray(np.random.default_rng(0).integers(32, 127, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)
        char_logits, token_logits = model.apply(params, x)
        assert char_logits.shape == (2, 8, 256) and token_logits.shape == (2, 64, 128)
        # inference mode: single output
        only_char = model.apply(params, x, return_token_logits=False)
        assert only_char.shape == (2, 8, 256)
        y = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 8)).astype(np.int32))
        tok = np.random.default_rng(2).integers(1, 128, (2, 64)).astype(np.int32)
        tok[:, :10] = 0  # padding must be ignored
        total, cl, tl = compute_dual_loss(char_logits, token_logits, y, jnp.asarray(tok))
        # torch oracle with ignore_index=0
        tl_ref = torch.nn.functional.cross_entropy(
            torch.tensor(np.asarray(token_logits)).reshape(-1, 128),
            torch.tensor(tok.reshape(-1).astype(np.int64)),
            ignore_index=0,
        )
        np.testing.assert_allclose(float(tl), float(tl_ref), rtol=1e-5)


class TestHashWordTokenizer:
    def test_word_token_alignment(self):
        from spectral_tpu.models.dual_head import HashWordTokenizer, get_word_token_ids

        text = "the cat sat"
        x = np.asarray([[ord(c) for c in text]])
        ids = get_word_token_ids(x, vocab_size=1000)[0]
        # "the" spans [0,3), "cat" [4,7), "sat" [8,11); spaces stay 0
        assert ids[0] == ids[1] == ids[2] != 0
        assert ids[3] == 0
        assert ids[4] == ids[5] == ids[6] != 0
        assert ids[0] != ids[4]  # different words, different ids
        # deterministic + consistent with the encode() path
        tok = HashWordTokenizer(1000)
        assert tok.encode("the cat sat") == [int(ids[0]), int(ids[4]), int(ids[8])]

    def test_used_by_fallback_trainer_path(self):
        from spectral_tpu.models.dual_head import HashWordTokenizer, get_token_ids_fast

        tok = HashWordTokenizer(500)
        x = np.asarray([[ord(c) for c in "hello world again"]])
        ids = get_token_ids_fast(x, tok)
        assert ids.shape == x.shape
        assert (ids > 0).all()  # equal-chunk assignment covers the window


class TestWindowedChunkDataset:
    def test_windows_and_hann(self):
        from spectral_tpu.train.data import WindowedChunkDataset

        rng = np.random.default_rng(0)
        corpus = rng.integers(0, 256, 10000).astype(np.uint8)
        ds = WindowedChunkDataset(corpus, seq_len=64, chunk_size=512, overlap=256)
        assert ds.stride == 256 and ds.num_chunks > 0
        x, y, w = ds.get_window(3)
        assert x.shape == (64,) and y.shape == (512,) and w.shape == (512,)
        np.testing.assert_allclose(w, np.hanning(512), atol=1e-6)
        xs, ys, ws = ds.sample_batch(4, np.random.default_rng(1))
        assert xs.shape == (4, 64) and ys.shape == (4, 512) and ws.shape == (4, 512)
