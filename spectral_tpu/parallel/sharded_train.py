"""pjit-sharded training step over a (dp, sp, tp) mesh.

The jitted step is the same math as train.trainer.make_train_step; sharding
is expressed declaratively: batches sharded (dp, sp), params per
mesh.param_pspecs, optimizer state following the params.  XLA inserts the ICI
collectives (grad psum over dp, FFN psum over tp, re-shards around the FFT).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.parallel.mesh import batch_pspec, param_pspecs
from spectral_tpu.train.evaluate import cross_entropy


def _fused_mesh_mode(cfg: TrainConfig, mesh: Mesh):
    """Which fused-kernel route (if any) covers this (cfg, mesh).

    "dp": only dp sharded — shard_map the whole fused step, each device
    drives its batch shard through the per-batch-element grid kernels.
    "mesh": sp > 1 and/or tp > 1 (dp free to combine) — the mesh tail
    route (models/fused_apply._tail_mesh): Ulysses all-to-all conv under
    sp + per-shard tail kernels, hidden-sharded FFN (residual_alpha
    partial-sum + psum) under tp.  None: a non-standard block — flax
    paths."""
    if not cfg.use_fused_block or cfg.bicameral or cfg.frequency_native:
        return None
    if mesh.shape.get("sp", 1) > 1 or mesh.shape.get("tp", 1) > 1:
        return "mesh"
    return "dp"


def _fused_dp_applicable(cfg: TrainConfig, mesh: Mesh) -> bool:
    """The fused Pallas kernels run wholesale under the mesh iff the ONLY
    sharded model axis is dp: each device then drives its full batch shard
    through the per-batch-element grid kernel and the grad psum over dp
    comes from the shard_map transpose."""
    return _fused_mesh_mode(cfg, mesh) == "dp"


def make_sharded_train_step(model, cfg: TrainConfig, tx, mesh: Mesh) -> Callable:
    """Build the sharded (params, opt_state, bx, by, cutoff, lr, rng) step.

    bx/by: [accum, B, T] int32 sharded P(None, dp, sp).
    """

    fused_mode = _fused_mesh_mode(cfg, mesh)
    if fused_mode == "mesh":
        # sp/tp fused route: fused_lm_apply on GLOBAL arrays — the
        # Ulysses conv + per-shard tail shard_maps (incl. the tp hidden
        # split + psum) live inside it, and jit's sharding propagation
        # handles the rest (pooled-gate psum over sp, grad psums over dp)
        # exactly as for the flax path.
        from spectral_tpu.models.fused_apply import fused_lm_apply

        def loss_fn(params, bx, by, cutoff, rng):
            logits = fused_lm_apply(
                params, bx, cfg, cutoff=cutoff,
                deterministic=cfg.dropout == 0.0, rng=rng, mesh=mesh,
            )
            return cross_entropy(logits, by)
    elif fused_mode == "dp":
        # dp-sharded fused-kernel path (VERDICT r2 missing #2): shard_map
        # splits the batch over dp, every device runs the SAME fused Pallas
        # program on its shard (replicated params), and the loss/grad psum
        # over dp is inserted by pmean + the shard_map transpose.  Math is
        # identical to the single-chip fused step (equal shard sizes).
        from jax import shard_map

        from spectral_tpu.models.fused_apply import fused_lm_apply

        def _local_loss(params, bx, by, cutoff, rng):
            if cfg.dropout > 0.0:
                # decorrelate dropout streams across dp shards
                rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
            logits = fused_lm_apply(
                params, bx, cfg, cutoff=cutoff,
                deterministic=cfg.dropout == 0.0, rng=rng,
            )
            return jax.lax.pmean(cross_entropy(logits, by), "dp")

        def loss_fn(params, bx, by, cutoff, rng):
            return shard_map(
                _local_loss,
                mesh=mesh,
                in_specs=(P(), P("dp", None), P("dp", None), P(), P()),
                out_specs=P(),
                check_vma=False,  # custom_vjp inside (pallas_block/tail)
            )(params, bx, by, cutoff, rng)
    else:
        def loss_fn(params, bx, by, cutoff, rng):
            logits = model.apply(
                {"params": params},
                bx,
                cutoff=cutoff,
                deterministic=cfg.dropout == 0.0,
                rngs=None if cfg.dropout == 0.0 else {"dropout": rng},
            )
            return cross_entropy(logits, by)

    def step(params, opt_state, bx, by, cutoff, lr, rng):
        accum = bx.shape[0]

        # same flat-accum fold as the single-chip trainer (round-4
        # attribution: the scan's per-micro grad materialize+add cost
        # 7.45 ms of the 27.6 ms flagship step; identical gradients —
        # tests/unit/test_trainer_accum.py).  The reshape merges the
        # accum axis into the dp-sharded batch axis, so each chip's
        # local batch grows by accum and the dp sharding is preserved;
        # the chip-validated token cap applies to the LOCAL shard, so
        # compare per-chip tokens (global // dp) against it — comparing
        # global tokens silently disabled the fold for any dp>1 recipe
        # whose per-chip batch fits (r4 advisor)
        local_tokens = bx.size // mesh.shape.get("dp", 1)
        if (accum > 1
                and getattr(cfg, "flatten_accum", "never") in ("auto", "always")
                and (cfg.flatten_accum == "always"
                     or local_tokens <= cfg.flatten_accum_max_tokens)):
            # merge b-MAJOR (swapaxes first): the accum axis folds INSIDE
            # each dp shard's contiguous batch block, so the fold is
            # shard-local — a direct reshape would interleave accum
            # across dp and force a cross-chip reshard
            def fold(a):
                return jnp.swapaxes(a, 0, 1).reshape(
                    1, a.shape[0] * a.shape[1], a.shape[2])

            bx, by = fold(bx), fold(by)
            accum = 1

        def micro(carry, xs):
            g_acc, l_acc, rng = carry
            mbx, mby = xs
            rng, sub = jax.random.split(rng)
            l, g = jax.value_and_grad(loss_fn)(params, mbx, mby, cutoff, sub)
            return (jax.tree.map(lambda a, b: a + b, g_acc, g), l_acc + l, rng), None

        g0 = jax.tree.map(jnp.zeros_like, params)
        (g, loss_sum, _), _ = jax.lax.scan(micro, (g0, 0.0, rng), (bx, by))
        g = jax.tree.map(lambda a: a / accum, g)

        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_sum / accum

    # --- sharding declarations
    def build(params_example, opt_state_example):
        """Returns (jitted_step, opt_state) with the opt state committed to
        the mesh (param-following shardings for moments, replicated scalars)."""
        pspecs = param_pspecs(params_example)
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)

        replicated = NamedSharding(mesh, P())

        def commit_opt(leaf):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return leaf  # moments already follow their param's sharding
            return jax.device_put(leaf, replicated)

        opt_state_example = jax.tree.map(commit_opt, opt_state_example)
        opt_sh = jax.tree.map(lambda l: l.sharding, opt_state_example)

        data_sh = NamedSharding(mesh, batch_pspec(with_accum=True))
        jitted = jax.jit(
            step,
            in_shardings=(param_sh, opt_sh, data_sh, data_sh, replicated, replicated, replicated),
            out_shardings=(param_sh, opt_sh, replicated),
            donate_argnums=(0, 1),
        )
        return jitted, opt_state_example

    return build
