"""Parity gates for the fused positionwise tail kernel (ops/pallas_tail.py)
— the long-sequence fused route (conv in XLA + tail in Pallas).

Oracle: the canonical flax ``FixedSpectralBlock`` / ``FixedSpectralLM``
(models/backbone.py — golden-tested against a fresh torch implementation of
the reference equations, fft_lm/train_fixed_full.py:497-563).  Values AND
gradients must match at fp32 accuracy in interpret mode (dropout=0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.models.backbone import FixedSpectralBlock, FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.models.fused_apply import (
    fused_block_apply_tail,
    fused_lm_apply,
    fused_path_for,
)
from spectral_tpu.ops.pallas_tail import pick_chunk, tail_vmem_bytes

B, T, C, K = 2, 64, 32, 16
TRANS = 8


class TestDispatch:
    def test_flagship_uses_whole_block(self):
        assert fused_path_for(1024, 512, 1024) == "block"
        assert fused_path_for(2048, 128, 256) == "block"

    def test_long_seq_uses_tail(self):
        # the round-2 cliff: whole-block kernel stops at 2048 (and at
        # 2048/d512 its VMEM estimate already fails — round 2 fell back to
        # the flax direct path there); the tail route covers all of it
        assert fused_path_for(2048, 512, 1024) == "tail"
        assert fused_path_for(4096, 512, 1024) == "tail"
        assert fused_path_for(8192, 512, 1024) == "tail"
        assert fused_path_for(16384, 1024, 2048) == "tail"

    def test_chunk_is_aligned_and_divides(self):
        for Ts, Cs, Hs in ((4096, 512, 1024), (2560, 128, 256), (8192, 1024, 2048)):
            S = pick_chunk(Ts, Cs, Hs)
            assert S is not None and Ts % S == 0 and S % 8 == 0
            assert tail_vmem_bytes(S, Cs, Hs) <= 60 * 1024 * 1024

    def test_odd_t_falls_back(self):
        # T with no multiple-of-8 divisor -> no tail route
        assert pick_chunk(4095, 512, 1024) is None


@pytest.fixture(scope="module", params=["direct", "matmul", "pallas"])
def block_setup(request):
    backend = request.param
    blk = FixedSpectralBlock(
        d_model=C, seq_len=T, kernel_len=K, transition_bins=TRANS,
        dropout=0.0, fft_backend=backend, fft_precision="highest",
        causal_taps=True,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, C)).astype(np.float32))
    cutoff = jnp.int32(20)
    params = blk.init(jax.random.PRNGKey(1), x, cutoff, True)
    return blk, backend, x, cutoff, params


def _tail_out(p, x, cutoff, backend):
    return fused_block_apply_tail(
        p, x, cutoff, kernel_len=K, transition_bins=TRANS,
        deterministic=True, compute_dtype="float32",
        conv_backend=backend, interpret=True,
    )


def test_forward_parity(block_setup):
    blk, backend, x, cutoff, params = block_setup
    ref = blk.apply(params, x, cutoff, True)
    out = _tail_out(params["params"], x, cutoff, backend)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_gradient_parity(block_setup):
    blk, backend, x, cutoff, params = block_setup

    def loss_ref(pp, xx):
        return jnp.sum(jnp.sin(blk.apply(pp, xx, cutoff, True)))

    def loss_tail(pp, xx):
        return jnp.sum(jnp.sin(_tail_out(pp, xx, cutoff, backend)))

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_f, gx_f = jax.grad(loss_tail, argnums=(0, 1))(params["params"], x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-6)
    flat_r = jax.tree.leaves_with_path(gp_r["params"])
    flat_f = dict(jax.tree.leaves_with_path(gp_f))
    assert len(flat_r) == len(flat_f)
    for path, leaf_r in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf_r), rtol=2e-4, atol=1e-6,
            err_msg=str(path),
        )


def test_traced_cutoff_no_recompile(block_setup):
    blk, backend, x, cutoff, params = block_setup

    @jax.jit
    def f(p, x, cut):
        return _tail_out(p, x, cut, backend)

    a = f(params["params"], x, jnp.int32(10))
    b = f(params["params"], x, jnp.int32(30))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    ref_b = blk.apply(params, x, jnp.int32(30), True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref_b), rtol=2e-5, atol=2e-6)


@pytest.fixture(scope="module")
def lm_setup():
    cfg = TrainConfig(
        vocab_size=64, d_model=C, n_layers=2, seq_len=T, kernel_len=K,
        jpeg_transition=TRANS, dropout=0.0, compute_dtype="float32",
        fft_backend="direct", fft_precision="highest",
    )
    model = FixedSpectralLM(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, 64)
    variables = model.init(jax.random.PRNGKey(0), toks)
    return cfg, model, toks, variables


def test_lm_parity_forced_tail(lm_setup):
    """fused_lm_apply(force_path="tail") == flax apply at a shape that would
    normally dispatch to the whole-block kernel — pins the tail route's LM
    integration without a 4096-long CPU run."""
    cfg, model, toks, variables = lm_setup
    cutoff = jnp.int32(24)
    ref = model.apply(variables, toks, cutoff=cutoff, deterministic=True)
    out = fused_lm_apply(variables["params"], toks, cfg, cutoff=cutoff,
                         deterministic=True, interpret=True, force_path="tail")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lm_grad_parity_forced_tail(lm_setup):
    cfg, model, toks, variables = lm_setup
    cutoff = jnp.int32(24)
    tgt = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, 64)

    def ce(logits):
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(lse - picked)

    def loss_ref(v):
        return ce(model.apply(v, toks, cutoff=cutoff, deterministic=True))

    def loss_tail(p):
        return ce(fused_lm_apply(p, toks, cfg, cutoff=cutoff,
                                 deterministic=True, interpret=True,
                                 force_path="tail"))

    g_r = jax.grad(loss_ref)(variables)["params"]
    g_f = jax.grad(loss_tail)(variables["params"])
    flat_r = jax.tree.leaves_with_path(g_r)
    flat_f = dict(jax.tree.leaves_with_path(g_f))
    for path, leaf_r in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf_r), rtol=5e-4, atol=1e-6,
            err_msg=str(path),
        )


def test_long_seq_dispatch_parity():
    """A real >2048 sequence routes through the tail path (auto dispatch)
    and matches the flax matmul-FFT path — the round-2 seq cliff, closed.
    Small d keeps the CPU cost of the 8192-point transforms modest."""
    Tl, Cl = 2560, 16  # 2560 > 2048 -> n_fft 4096, tail dispatch
    cfg = TrainConfig(
        vocab_size=64, d_model=Cl, n_layers=1, seq_len=Tl, kernel_len=K,
        jpeg_transition=TRANS, dropout=0.0, compute_dtype="float32",
        fft_backend="matmul", fft_precision="highest",
    )
    assert fused_path_for(Tl, Cl, 2 * Cl) == "tail"
    model = FixedSpectralLM(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, Tl), 0, 64)
    variables = model.init(jax.random.PRNGKey(0), toks)
    cutoff = jnp.int32(100)
    ref = model.apply(variables, toks, cutoff=cutoff, deterministic=True)
    out = fused_lm_apply(variables["params"], toks, cfg, cutoff=cutoff,
                         deterministic=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=3e-5)


def test_dropout_cpu_value_path():
    """Off-TPU dropout routes through the host-mask value path: seeded
    determinism, masks active, grads finite (mirrors the whole-block gate)."""
    blk_cfg = dict(kernel_len=K, transition_bins=TRANS)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(B, T, C)).astype(np.float32))
    cfg = TrainConfig(vocab_size=64, d_model=C, n_layers=1, seq_len=T, kernel_len=K,
                      jpeg_transition=TRANS, dropout=0.2, compute_dtype="float32")
    model = FixedSpectralLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T), jnp.int32))
    p = variables["params"]["block_0"]

    det = fused_block_apply_tail(p, x, jnp.int32(20), deterministic=True,
                                 compute_dtype="float32", interpret=True, **blk_cfg)
    drop = fused_block_apply_tail(p, x, jnp.int32(20), dropout=0.2,
                                  seed=jnp.uint32(9), deterministic=False,
                                  compute_dtype="float32", interpret=True, **blk_cfg)
    assert float(jnp.max(jnp.abs(drop - det))) > 0
    drop2 = fused_block_apply_tail(p, x, jnp.int32(20), dropout=0.2,
                                   seed=jnp.uint32(9), deterministic=False,
                                   compute_dtype="float32", interpret=True, **blk_cfg)
    np.testing.assert_array_equal(np.asarray(drop), np.asarray(drop2))

    def loss(pp, xx):
        return jnp.sum(jnp.square(fused_block_apply_tail(
            pp, xx, jnp.int32(20), dropout=0.2, seed=jnp.uint32(9),
            deterministic=False, compute_dtype="float32", interpret=True,
            **blk_cfg)))

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves((gp, gx)))


def test_tp_dropout_psum_linearity():
    """Tensor-parallel dropout exactness (closes round-3 weak #5): with
    the seed-PAIR scheme, tp shards share the conv/output masks (required
    — they multiply pre-split/post-sum values) but draw INDEPENDENT
    hidden masks, and the psum of hidden-sharded tails (alpha=1/tp, b2/tp)
    equals the unsharded tail under the concatenated full-H hidden mask —
    i.e. tp>1 dropout is EXACTLY unsharded dropout with independent
    per-unit draws, no statistical deviation left."""
    from spectral_tpu.ops.pallas_tail import (
        _host_masks3,
        _seed_pair,
        _tail_forward_values,
    )

    rng = np.random.default_rng(11)
    Tt, Ct, Ht = 16, 8, 32
    h = Ht // 2
    f32 = jnp.float32
    x = jnp.asarray(rng.normal(size=(Tt, Ct)).astype(np.float32))
    conv = jnp.asarray(rng.normal(size=(Tt, Ct)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(1, Ct)).astype(np.float32))
    ln2s, ln2b = jnp.ones((Ct,), f32), jnp.zeros((Ct,), f32)
    W1 = jnp.asarray(rng.normal(size=(Ct, Ht)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(Ht,)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(Ht, Ct)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(Ct,)).astype(np.float32))
    p = 0.4

    # scalar seed normalizes to [s, s]; per-shard pairs share the first
    assert np.asarray(_seed_pair(jnp.uint32(7))).tolist() == [7, 7]
    seeds = [jnp.asarray([7, 100 + i], jnp.uint32) for i in range(2)]
    shard_masks = [_host_masks3(sd, 1, Tt, Ct, h, p) for sd in seeds]
    np.testing.assert_array_equal(shard_masks[0][0], shard_masks[1][0])
    np.testing.assert_array_equal(shard_masks[0][2], shard_masks[1][2])
    assert np.any(np.asarray(shard_masks[0][1]) != np.asarray(shard_masks[1][1]))

    outs = []
    for i, masks in enumerate(shard_masks):
        sl = slice(i * h, (i + 1) * h)
        out, _ = _tail_forward_values(
            x, conv, s, ln2s, ln2b, W1[:, sl], b1[sl], W2[sl], b2 / 2,
            f32, tuple(m[0] for m in masks), alpha=0.5)
        outs.append(out)
    psum = outs[0] + outs[1]

    full_hidden = jnp.concatenate(
        [shard_masks[0][1][0], shard_masks[1][1][0]], axis=-1)
    full_masks = (shard_masks[0][0][0], full_hidden, shard_masks[0][2][0])
    ref, _ = _tail_forward_values(x, conv, s, ln2s, ln2b, W1, b1, W2, b2,
                                  f32, full_masks, alpha=1.0)
    np.testing.assert_allclose(np.asarray(psum), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trainer_long_seq_descends():
    """make_train_step with the tail route (forced via a >2048 seq would be
    slow on CPU; instead force tail at T=64 through use_fused_block +
    monkeypatched dispatch) descends and stays finite."""
    from spectral_tpu.models import fused_apply as fa
    from spectral_tpu.train.trainer import init_model, make_optimizer, make_train_step

    cfg = TrainConfig(
        vocab_size=64, d_model=C, n_layers=2, seq_len=T, kernel_len=K,
        jpeg_transition=TRANS, dropout=0.0, compute_dtype="float32",
        use_fused_block=True, batch_size=2, accum_steps=2,
    )
    model, params = init_model(cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    orig = fa.fused_path_for
    fa.fused_path_for = lambda *a: "tail"
    try:
        step = make_train_step(model, cfg, tx)
        rng = np.random.default_rng(0)
        bx = jnp.asarray(rng.integers(0, 64, (2, 2, T)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 64, (2, 2, T)).astype(np.int32))
        losses = []
        for i in range(4):
            params, opt_state, loss = step(
                params, opt_state, bx, by, jnp.int32(24), jnp.float32(3e-3),
                jax.random.PRNGKey(i),
            )
            losses.append(float(loss))
    finally:
        fa.fused_path_for = orig
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
