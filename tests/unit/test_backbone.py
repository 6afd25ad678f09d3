"""FixedSpectralBlock / FixedSpectralLM: causality, dispatch, torch golden parity.

The torch reference block here is written fresh from the reference equations
(train_fixed_full.py:497-563) and used as the golden oracle for fwd parity —
the foundation of the "LM loss curves match the reference" contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spectral_tpu.models.backbone import FixedSpectralBlock, FixedSpectralLM
from spectral_tpu.models.config import TrainConfig


def tiny_cfg(**kw):
    base = dict(
        d_model=32,
        n_layers=2,
        seq_len=64,
        kernel_len=16,
        jpeg_transition=8,
        batch_size=2,
        dropout=0.0,
    )
    base.update(kw)
    return TrainConfig(**base)


class TestFixedSpectralBlock:
    def test_shapes_and_grads(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 64, 32)).astype(np.float32)
        blk = FixedSpectralBlock(d_model=32, seq_len=64, kernel_len=16, transition_bins=8, dropout=0.0)
        params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = blk.apply(params, jnp.asarray(x), cutoff=jnp.int32(16))
        assert y.shape == x.shape

        def loss(p):
            return jnp.sum(blk.apply(p, jnp.asarray(x), cutoff=jnp.int32(16)) ** 2)

        g = jax.grad(loss)(params)
        leaves = {p: float(jnp.linalg.norm(v)) for p, v in jax.tree_util.tree_leaves_with_path(g)}
        assert all(np.isfinite(v) for v in leaves.values())
        # kernel, gain, and gates must all receive gradient
        total = sum(leaves.values())
        assert total > 0

    def test_causality_full_model(self):
        """Perturbing the future must not change past logits (the block's
        entire reason to exist, train_fixed_full.py:427-436)."""
        cfg = tiny_cfg()
        model = FixedSpectralLM(cfg)
        rng = np.random.default_rng(1)
        x = rng.integers(0, 256, (2, 64)).astype(np.int32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        logits1 = np.asarray(model.apply(params, jnp.asarray(x)))
        x2 = x.copy()
        x2[:, 40:] = (x2[:, 40:] + 77) % 256
        logits2 = np.asarray(model.apply(params, jnp.asarray(x2)))
        np.testing.assert_allclose(logits1[:, :40], logits2[:, :40], atol=1e-4)
        assert not np.allclose(logits1[:, 40:], logits2[:, 40:], atol=1e-3)


class TestTrainedGateCausality:
    """THE round-2 defect fix.  The reference's conv is causal only while
    the effective kernel irfft(k̂·gate·mask) is short; TRAINED per-bin gates
    (or the curriculum mask) give it a circular tail whose taps wrap onto
    FUTURE positions — a round-2 model trained without the fix reached
    held-out loss 0.0067 by reading tokens a few steps ahead (perturbing the
    last token moved past logits by ~10) while generating garbage.  With
    causal_taps=True (the default) the filter is projected onto its first
    n_fft-T taps, which makes the conv exactly causal for ANY gate values.
    """

    def _randomized(self, cfg, seed=0):
        model = FixedSpectralLM(cfg)
        x0 = jnp.zeros((1, cfg.seq_len), jnp.int32)
        params = model.init(jax.random.PRNGKey(seed), x0)["params"]

        # trained-like: spread the per-bin gate logits hard (this is what
        # creates the wraparound tail)
        def spread(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "gate_freq_logits" in name:
                return leaf + 2.0 * jax.random.normal(jax.random.PRNGKey(11), leaf.shape)
            if "kernel" == name.split("/")[-1] and leaf.ndim == 1:
                return leaf + 0.1 * jax.random.normal(jax.random.PRNGKey(12), leaf.shape)
            return leaf

        return model, jax.tree_util.tree_map_with_path(spread, params)

    def _leak(self, model, params, cfg, cutoff):
        rng = np.random.default_rng(3)
        x = rng.integers(0, 256, (1, cfg.seq_len)).astype(np.int32)
        x2 = x.copy()
        x2[0, -1] = (x2[0, -1] + 7) % 256  # perturb ONLY the last token
        l1 = model.apply({"params": params}, jnp.asarray(x), cutoff=cutoff, deterministic=True)
        l2 = model.apply({"params": params}, jnp.asarray(x2), cutoff=cutoff, deterministic=True)
        return float(jnp.max(jnp.abs(l1[0, :-1] - l2[0, :-1])))

    @pytest.mark.parametrize("variant", ["standard", "bicameral"])
    def test_causal_taps_kills_the_leak(self, variant):
        kw = {"bicameral": True} if variant == "bicameral" else {}
        cfg_fix = tiny_cfg(causal_taps=True, **kw)
        cfg_ref = tiny_cfg(causal_taps=False, **kw)
        m_fix, p = self._randomized(cfg_fix)
        m_ref = FixedSpectralLM(cfg_ref)
        cutoff = jnp.int32(24)  # curriculum mask active: also a tail source
        leak_ref = self._leak(m_ref, p, cfg_ref, cutoff)
        leak_fix = self._leak(m_fix, p, cfg_fix, cutoff)
        assert leak_ref > 1e-4, f"reference equations show no leak ({leak_ref:.2e})?"
        assert leak_fix < 1e-4, f"causal_taps left a future leak of {leak_fix:.2e}"

    def test_effective_kernel_unchanged_when_short(self):
        """With a saturated/uniform gate and no mask the projection is a
        no-op: the fixed and reference blocks agree to float tolerance."""
        cfg_fix = tiny_cfg(causal_taps=True)
        cfg_ref = tiny_cfg(causal_taps=False)
        model_fix = FixedSpectralLM(cfg_fix)
        model_ref = FixedSpectralLM(cfg_ref)
        x = jnp.asarray(np.random.default_rng(4).integers(0, 256, (1, 64)).astype(np.int32))
        params = model_fix.init(jax.random.PRNGKey(0), x)["params"]
        y_fix = model_fix.apply({"params": params}, x, deterministic=True)
        y_ref = model_ref.apply({"params": params}, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(y_fix), np.asarray(y_ref), atol=2e-4)

    def test_cutoff_traced_no_recompile(self):
        cfg = tiny_cfg()
        model = FixedSpectralLM(cfg)
        x = jnp.zeros((1, 64), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)
        traces = []

        @jax.jit
        def fwd(p, x, cutoff):
            traces.append(1)
            return model.apply(p, x, cutoff=cutoff)

        fwd(params, x, jnp.int32(16))
        fwd(params, x, jnp.int32(33))
        assert len(traces) == 1

    def test_block_dispatch(self):
        for flags, cls_name in [
            (dict(), "FixedSpectralBlock"),
            (dict(frequency_native=True), "FrequencyNativeBlock"),
            (dict(bicameral=True), "BicameralBlock"),
        ]:
            cfg = tiny_cfg(**flags)
            model = FixedSpectralLM(cfg)
            x = jnp.zeros((1, 64), jnp.int32)
            params = model.init(jax.random.PRNGKey(0), x)
            y = model.apply(params, x, cutoff=jnp.int32(16))
            assert y.shape == (1, 64, 256)

    def test_weight_tying(self):
        """Logits must be h @ embed.T — no separate output matrix."""
        cfg = tiny_cfg()
        model = FixedSpectralLM(cfg)
        x = jnp.zeros((1, 64), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x)
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = ["/".join(str(k.key) for k in path) for path, _ in flat]
        assert not any("lm_head" in n or "output" in n for n in names)
        h = model.apply(params, x, method=FixedSpectralLM.forward_hidden)
        logits = model.apply(params, x)
        emb = params["params"]["embed"]["embedding"]
        np.testing.assert_allclose(np.asarray(logits), np.asarray(h @ emb.T), atol=1e-5)


def _torch_block_forward(x_np, p, cutoff, kernel_len, transition_bins):
    """Fresh torch implementation of the reference block equations
    (train_fixed_full.py:497-563), parameterized by a dict of numpy arrays."""
    x = torch.tensor(x_np)
    residual = x
    x = torch.nn.functional.layer_norm(
        x, (x.shape[-1],), torch.tensor(p["ln_scale"]), torch.tensor(p["ln_bias"])
    )
    B, T, C = x.shape
    n_fft = 1
    while n_fft < (T + kernel_len - 1):
        n_fft *= 2
    k = torch.zeros(n_fft)
    k[:kernel_len] = torch.tensor(p["kernel"])
    k_freq = torch.fft.rfft(k)
    x_pad = torch.nn.functional.pad(x, (0, 0, 0, n_fft - T))
    x_freq = torch.fft.rfft(x_pad, dim=1)
    y_freq = x_freq * k_freq.unsqueeze(0).unsqueeze(-1) * torch.tensor(p["gain"]).unsqueeze(0).unsqueeze(0)
    Fbins = y_freq.size(1)
    g_freq = torch.sigmoid(torch.tensor(p["gate_freq_logits"][:Fbins]))
    pooled = x.mean(dim=1)
    g_ctx = torch.sigmoid(pooled @ torch.tensor(p["gate_ctx_w"]) + torch.tensor(p["gate_ctx_b"]))
    y_freq = y_freq * g_freq.unsqueeze(0).unsqueeze(-1) * g_ctx.unsqueeze(1)
    if cutoff is not None:
        cutoff_idx = min(int(cutoff), Fbins)
        if cutoff_idx < Fbins:
            trans = min(transition_bins, cutoff_idx)
            mask = torch.ones(Fbins)
            start = cutoff_idx - trans
            if trans > 0:
                t = torch.linspace(0, 1, steps=trans)
                mask[start:cutoff_idx] = 0.5 * (1.0 + torch.cos(torch.pi * t))
            mask[cutoff_idx:] = 0.0
            y_freq = y_freq * mask.unsqueeze(0).unsqueeze(-1)
    y = torch.fft.irfft(y_freq, n=n_fft, dim=1)[:, :T, :]
    x = residual + y
    ff_in = torch.nn.functional.layer_norm(
        x, (C,), torch.tensor(p["ffn_ln_scale"]), torch.tensor(p["ffn_ln_bias"])
    )
    h = ff_in @ torch.tensor(p["ffn_in_w"]) + torch.tensor(p["ffn_in_b"])
    h = torch.nn.functional.gelu(h)
    h = h @ torch.tensor(p["ffn_out_w"]) + torch.tensor(p["ffn_out_b"])
    return (x + h).numpy()


class TestTorchGoldenParity:
    @pytest.mark.parametrize("cutoff", [None, 16, 33])
    def test_block_forward_matches_torch(self, cutoff):
        rng = np.random.default_rng(7)
        B, T, C, K, TRANS = 2, 64, 32, 16, 8
        x_np = rng.standard_normal((B, T, C)).astype(np.float32)

        # causal_taps=False: the golden oracle implements the REFERENCE
        # equations verbatim, which include the circular-tail leak the
        # production default fixes (see TestTrainedGateCausality)
        blk = FixedSpectralBlock(
            d_model=C, seq_len=T, kernel_len=K, transition_bins=TRANS, dropout=0.0,
            causal_taps=False,
        )
        params = blk.init(jax.random.PRNGKey(3), jnp.asarray(x_np))
        # randomize params so the test is not trivially identity
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
        leaves = [l + 0.1 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
        params = jax.tree.unflatten(treedef, leaves)

        pp = params["params"]
        torch_p = {
            "ln_scale": np.asarray(pp["ln"]["scale"]),
            "ln_bias": np.asarray(pp["ln"]["bias"]),
            "kernel": np.asarray(pp["kernel"]),
            "gain": np.asarray(pp["gain"]),
            "gate_freq_logits": np.asarray(pp["gate_freq_logits"]),
            "gate_ctx_w": np.asarray(pp["gate_ctx"]["kernel"]),
            "gate_ctx_b": np.asarray(pp["gate_ctx"]["bias"]),
            "ffn_ln_scale": np.asarray(pp["ffn"]["ffn_ln"]["scale"]),
            "ffn_ln_bias": np.asarray(pp["ffn"]["ffn_ln"]["bias"]),
            "ffn_in_w": np.asarray(pp["ffn"]["ffn_in"]["kernel"]),
            "ffn_in_b": np.asarray(pp["ffn"]["ffn_in"]["bias"]),
            "ffn_out_w": np.asarray(pp["ffn"]["ffn_out"]["kernel"]),
            "ffn_out_b": np.asarray(pp["ffn"]["ffn_out"]["bias"]),
        }

        y_torch = _torch_block_forward(x_np, torch_p, cutoff, K, TRANS)
        c = None if cutoff is None else jnp.int32(cutoff)
        y_jax = np.asarray(blk.apply(params, jnp.asarray(x_np), cutoff=c))
        np.testing.assert_allclose(y_jax, y_torch, rtol=1e-4, atol=1e-4)


class TestFrequencyNativeGradSafety:
    def test_grads_finite_with_active_cutoff(self):
        """Regression: JAX abs/angle grads NaN at the exact zeros the cutoff
        mask creates; the safe mag/phase decomposition must keep every grad
        finite in frequency-native mode at a low cutoff."""
        import jax
        import jax.numpy as jnp

        cfg = tiny_cfg(frequency_native=True)
        model = FixedSpectralLM(cfg)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.sum(model.apply(p, x, cutoff=jnp.int32(16)) ** 2)

        g = jax.grad(loss)(params)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            assert np.isfinite(np.asarray(leaf)).all(), f"non-finite grad in {name}"

    def test_grads_finite_bicameral_with_cutoff(self):
        import jax
        import jax.numpy as jnp

        cfg = tiny_cfg(bicameral=True)
        model = FixedSpectralLM(cfg)
        x = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x, cutoff=jnp.int32(16)) ** 2))(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


class TestBf16ComputePath:
    def test_bf16_close_to_fp32_and_faster_dtype(self):
        cfg32 = tiny_cfg()
        cfg16 = tiny_cfg(compute_dtype="bfloat16")
        m32, m16 = FixedSpectralLM(cfg32), FixedSpectralLM(cfg16)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
        params = m32.init(jax.random.PRNGKey(0), x)
        y32 = np.asarray(m32.apply(params, x))
        y16 = np.asarray(m16.apply(params, x))  # same param tree (fp32 leaves)
        assert y16.dtype == np.float32  # outputs stay fp32
        rel = np.abs(y16 - y32).max() / (np.abs(y32).max() + 1e-9)
        assert rel < 0.05  # bf16 matmul noise only

    def test_bf16_grads_finite(self):
        cfg = tiny_cfg(compute_dtype="bfloat16")
        model = FixedSpectralLM(cfg)
        x = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 64)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x, cutoff=jnp.int32(16)) ** 2))(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert all(np.asarray(l).dtype == np.float32 for l in leaves)  # fp32 master grads


class TestRemat:
    def test_remat_matches_plain(self):
        cfg_a = tiny_cfg()
        cfg_b = tiny_cfg(remat=True)
        m_a, m_b = FixedSpectralLM(cfg_a), FixedSpectralLM(cfg_b)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
        params = m_a.init(jax.random.PRNGKey(0), x)
        y_a = np.asarray(m_a.apply(params, x, cutoff=jnp.int32(16)))
        y_b = np.asarray(m_b.apply(params, x, cutoff=jnp.int32(16)))
        np.testing.assert_allclose(y_a, y_b, atol=1e-5)
        g_a = jax.grad(lambda p: jnp.sum(m_a.apply(p, x, cutoff=jnp.int32(16)) ** 2))(params)
        g_b = jax.grad(lambda p: jnp.sum(m_b.apply(p, x, cutoff=jnp.int32(16)) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
