"""Accum-flattening equivalence gate (round 4).

The trainer folds [accum, B, T] micro-batches into one flat [accum*B, T]
batch when the step fits on chip (cfg.flatten_accum, trainer.py) —
chip-measured 27.6 -> 20.2 ms at the flagship recipe.  The fold must be a
pure execution-strategy change: with dropout off, the optimizer step it
produces must equal the scan-of-micro-batches step to fp32 tolerance
(same loss, same updated params).

Reference for the accum semantics being preserved:
/root/reference/fft_lm/train_fixed_full.py:497-563 (loss.backward() per
micro-batch, optimizer.step() once).
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.trainer import init_model, make_optimizer, make_train_step


def _run(flatten):
    cfg = TrainConfig(
        d_model=32, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=4,
        batch_size=2, accum_steps=4, dropout=0.0, flatten_accum=flatten,
    )
    model, params = init_model(cfg, seed=0)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(3)
    bx = jnp.asarray(rng.integers(0, 256, (4, 2, 64)).astype(np.int32))
    by = jnp.asarray(rng.integers(0, 256, (4, 2, 64)).astype(np.int32))
    p, _, loss = step(params, opt_state, bx, by, jnp.int32(16),
                      jnp.float32(1e-3), jax.random.PRNGKey(0))
    return p, float(loss)


def test_flat_equals_scan():
    p_scan, l_scan = _run("never")
    p_flat, l_flat = _run("always")
    assert np.isclose(l_scan, l_flat, rtol=1e-5), (l_scan, l_flat)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        p_scan, p_flat)


def test_auto_respects_token_cap():
    """auto must NOT flatten past flatten_accum_max_tokens (the region
    beyond chip validation keeps the scan)."""
    cfg = TrainConfig(
        d_model=32, n_layers=1, seq_len=64, kernel_len=16, jpeg_transition=4,
        batch_size=2, accum_steps=4, dropout=0.0,
        flatten_accum="auto", flatten_accum_max_tokens=4 * 2 * 64 - 1,
    )
    model, params = init_model(cfg, seed=0)
    tx = make_optimizer(cfg)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(3)
    bx = jnp.asarray(rng.integers(0, 256, (4, 2, 64)).astype(np.int32))
    # under the cap the jaxpr must contain a length-4 scan; over it, not.
    jaxpr = jax.make_jaxpr(
        lambda p, bx, by: step(p, tx.init(p), bx, by, jnp.int32(16),
                               jnp.float32(1e-3), jax.random.PRNGKey(0))
    )(params, bx, bx)
    assert "scan[" in str(jaxpr) or "length=4" in str(jaxpr)
