"""Parity gates for the fused whole-block Pallas kernel (ops/pallas_block.py).

Oracle: the canonical flax ``FixedSpectralBlock`` / ``FixedSpectralLM``
(models/backbone.py — itself golden-tested against a fresh torch
implementation of the reference equations).  Values AND gradients must match
at fp32 accuracy in interpret mode (dropout=0; the dropout stream is
documented as statistically-but-not-bitwise equivalent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.models.backbone import FixedSpectralBlock, FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.models.fused_apply import fused_block_apply, fused_lm_apply
from spectral_tpu.ops.pallas_block import fused_block
from spectral_tpu.ops.toeplitz import toeplitz_matrix  # noqa: F401 (API surface)

B, T, C, K = 2, 64, 32, 16
TRANS = 8


@pytest.fixture(scope="module")
def block_setup():
    blk = FixedSpectralBlock(
        d_model=C, seq_len=T, kernel_len=K, transition_bins=TRANS,
        dropout=0.0, fft_backend="direct", fft_precision="highest",
        causal_taps=True,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, C)).astype(np.float32))
    cutoff = jnp.int32(20)
    params = blk.init(jax.random.PRNGKey(1), x, cutoff, True)
    return blk, x, cutoff, params


def _fused_out(p, x, cutoff):
    return fused_block_apply(
        p, x, cutoff, kernel_len=K, transition_bins=TRANS,
        deterministic=True, compute_dtype="float32", interpret=True,
    )


def test_forward_parity(block_setup):
    blk, x, cutoff, params = block_setup
    ref = blk.apply(params, x, cutoff, True)
    out = _fused_out(params["params"], x, cutoff)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_gradient_parity(block_setup):
    blk, x, cutoff, params = block_setup

    def loss_ref(pp, xx):
        return jnp.sum(jnp.sin(blk.apply(pp, xx, cutoff, True)))

    def loss_fused(pp, xx):
        return jnp.sum(jnp.sin(_fused_out(pp, xx, cutoff)))

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params["params"], x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-6)
    flat_r = jax.tree.leaves_with_path(gp_r["params"])
    flat_f = dict(jax.tree.leaves_with_path(gp_f))
    assert len(flat_r) == len(flat_f)
    for path, leaf_r in flat_r:
        leaf_f = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(leaf_r), rtol=2e-4, atol=1e-6,
            err_msg=str(path),
        )


def test_traced_cutoff_no_recompile(block_setup):
    blk, x, cutoff, params = block_setup

    @jax.jit
    def f(p, x, cut):
        return _fused_out(p, x, cut)

    a = f(params["params"], x, jnp.int32(10))
    b = f(params["params"], x, jnp.int32(30))
    assert not np.allclose(np.asarray(a), np.asarray(b))  # cutoff matters
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


def test_lm_parity(lm_setup):
    cfg, model, toks, variables = lm_setup
    cutoff = jnp.int32(24)
    ref = model.apply(variables, toks, cutoff=cutoff, deterministic=True)
    out = fused_lm_apply(variables["params"], toks, cfg, cutoff=cutoff,
                         deterministic=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lm_grad_parity(lm_setup):
    cfg, model, toks, variables = lm_setup
    cutoff = jnp.int32(24)
    tgt = jax.random.randint(jax.random.PRNGKey(3), (B, T), 0, 64)

    def ce(logits):
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(lse - picked)

    def loss_ref(v):
        return ce(model.apply(v, toks, cutoff=cutoff, deterministic=True))

    def loss_fused(p):
        return ce(fused_lm_apply(p, toks, cfg, cutoff=cutoff,
                                 deterministic=True, interpret=True))

    g_r = jax.grad(loss_ref)(variables)["params"]
    g_f = jax.grad(loss_fused)(variables["params"])
    flat_r = jax.tree.leaves_with_path(g_r)
    flat_f = dict(jax.tree.leaves_with_path(g_f))
    for path, leaf_r in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf_r), rtol=5e-4, atol=1e-6,
            err_msg=str(path),
        )


def test_trainer_uses_fused_path(lm_setup):
    """make_train_step(use_fused_block=True) descends and stays finite."""
    import optax  # noqa: F401

    from spectral_tpu.train.trainer import init_model, make_optimizer, make_train_step

    cfg = TrainConfig(
        vocab_size=64, d_model=C, n_layers=2, seq_len=T, kernel_len=K,
        jpeg_transition=TRANS, dropout=0.0, compute_dtype="float32",
        use_fused_block=True, batch_size=2, accum_steps=2,
    )
    model, params = init_model(cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
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
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="in-kernel PRNG has no CPU lowering")
def test_dropout_mask_statistics():
    """Regression gate for the int32->uint32 bitcast bug: mask zero-fraction
    must be ~p and mean ~1.0 (inverted dropout).  TPU-only (prng_seed has no
    interpret-mode lowering)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from spectral_tpu.ops.pallas_block import _dropout_masks

    p = 0.1

    def kern(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        (m,) = _dropout_masks([out_ref.shape], p)
        out_ref[...] = m

    fn = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,), in_specs=[],
            out_specs=pl.BlockSpec((256, 256), lambda i, *_: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )
    m = fn(jnp.array([7], jnp.uint32))
    zf = float(jnp.mean(m == 0.0))
    assert abs(zf - p) < 0.02, zf
    assert abs(float(jnp.mean(m)) - 1.0) < 0.02


def test_dropout_cpu_value_path():
    """Off-TPU, dropout>0 routes through the host-mask value path (the
    in-kernel TPU PRNG has no CPU lowering — regression for the crash the
    round-2 review found).  Masks must regenerate identically between fwd
    and bwd, outputs must differ from deterministic, grads stay finite."""
    blk_cfg = dict(kernel_len=K, transition_bins=TRANS)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(B, T, C)).astype(np.float32))
    cfg = TrainConfig(vocab_size=64, d_model=C, n_layers=1, seq_len=T, kernel_len=K,
                      jpeg_transition=TRANS, dropout=0.2, compute_dtype="float32")
    model = FixedSpectralLM(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T), jnp.int32))
    p = variables["params"]["block_0"]

    det = fused_block_apply(p, x, jnp.int32(20), deterministic=True,
                            compute_dtype="float32", interpret=True, **blk_cfg)
    drop = fused_block_apply(p, x, jnp.int32(20), dropout=0.2, seed=jnp.uint32(9),
                             deterministic=False, compute_dtype="float32",
                             interpret=True, **blk_cfg)
    assert float(jnp.max(jnp.abs(drop - det))) > 0  # masks active
    drop2 = fused_block_apply(p, x, jnp.int32(20), dropout=0.2, seed=jnp.uint32(9),
                              deterministic=False, compute_dtype="float32",
                              interpret=True, **blk_cfg)
    np.testing.assert_array_equal(np.asarray(drop), np.asarray(drop2))  # seeded

    def loss(pp, xx):
        return jnp.sum(jnp.square(fused_block_apply(
            pp, xx, jnp.int32(20), dropout=0.2, seed=jnp.uint32(9),
            deterministic=False, compute_dtype="float32", interpret=True,
            **blk_cfg)))

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves((gp, gx)))


def test_fused_trainer_matches_flax_trainer():
    """Step-for-step loss parity: the SAME init and batches through the
    fused train step and the flax train step (fp32, dropout=0) must
    produce matching loss trajectories — the CI version of
    experiments/backend_descent_check.py."""
    from spectral_tpu.train.trainer import init_model, make_optimizer, make_train_step

    base = dict(vocab_size=64, d_model=C, n_layers=2, seq_len=T, kernel_len=K,
                jpeg_transition=TRANS, dropout=0.0, compute_dtype="float32",
                batch_size=2, accum_steps=2, fft_precision="highest")
    rng = np.random.default_rng(7)
    bxs = [jnp.asarray(rng.integers(0, 64, (2, 2, T)).astype(np.int32)) for _ in range(5)]
    bys = [jnp.asarray(rng.integers(0, 64, (2, 2, T)).astype(np.int32)) for _ in range(5)]

    def run(cfg):
        model, params = init_model(cfg)
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)
        step = make_train_step(model, cfg, tx)
        losses = []
        for i in range(5):
            params, opt_state, loss = step(
                params, opt_state, bxs[i], bys[i], jnp.int32(24),
                jnp.float32(3e-3), jax.random.PRNGKey(0),
            )
            losses.append(float(loss))
        return losses

    l_flax = run(TrainConfig(**base, fft_backend="direct"))
    l_fused = run(TrainConfig(**base, use_fused_block=True))
    np.testing.assert_allclose(l_fused, l_flax, rtol=2e-4)
