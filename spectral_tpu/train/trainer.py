"""The LM training loop: jitted step + host-side curriculum control.

Reference: fft_lm/train_fixed_full.py:713-1004 ``main``.

TPU-native structure:
* ONE jitted ``train_step`` (forward + backward + clip + AdamW update),
  donated state, traced ``cutoff``/``lr`` scalars — the per-epoch curriculum
  and the per-step sawtooth LR never retrigger compilation.
* Gradient accumulation folds micro-batches inside the jitted step with
  ``lax.scan`` over a [accum, B, T] stacked batch (the reference loops
  micro-steps in Python and relies on grad buffers).
* bf16 is available via cfg.compute_dtype; complex math stays fp32 and the
  loss/update are fp32 — no GradScaler needed on TPU (reference AMP+scaler
  machinery has no analogue here by design).
* Multi-chip: pass ``mesh`` to shard the step with pjit (batch -> dp axis,
  d_model -> tp axis); single-chip runs unsharded.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train import schedules
from spectral_tpu.train.ckpt import load_checkpoint, load_params_flexible, save_checkpoint
from spectral_tpu.train.data import load_corpus_as_u8, make_val_starts, sample_lm_batch
from spectral_tpu.train.evaluate import cross_entropy, eval_loss, parroting_score
from spectral_tpu.train.sampling import generate, safe_console


def _print_flush(s: str) -> None:
    """Default logger: unbuffered print (console contract, SURVEY.md §5.5)."""
    print(s, flush=True)


def dropout_key(cfg: TrainConfig, seed: int) -> jax.Array:
    """Per-step dropout key.  ``cfg.dropout_prng="rbg"`` uses the TPU
    hardware RNG — threefry bit generation measured ~0.58 ms/block/micro at
    the flagship shape (35% of the block fwd+bwd), rbg makes it ~free
    (experiments/profile_block.py).  Param init stays threefry for exact
    reproducibility; dropout masks need no counter-based guarantees."""
    try:
        return jax.random.key(seed, impl=cfg.dropout_prng)
    except (KeyError, ValueError, TypeError) as e:
        # only a MISSING impl falls back (e.g. rbg off-TPU builds); a typo'd
        # config would otherwise silently lose the rbg speedup it asked for
        known = {"rbg", "unsafe_rbg", "threefry2x32"}
        if cfg.dropout_prng not in known:
            raise ValueError(
                f"cfg.dropout_prng={cfg.dropout_prng!r} is not a known PRNG "
                f"impl {sorted(known)}"
            ) from e
        return jax.random.PRNGKey(seed)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clipping; LR injected per step via inject_hyperparams."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(learning_rate, weight_decay=cfg.weight_decay),
        )
    )(learning_rate=cfg.lr)


@dataclass
class TrainState:
    """Host-side training state incl. the curriculum state that must resume
    without regressing (reference: train_bicameral.py:119-137)."""

    epoch: int = 0
    global_step: int = 0
    cutoff: int = 128
    best_loss_at_cutoff: float = float("inf")
    steps_without_improvement: int = 0
    loss_history: list = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "cutoff": self.cutoff,
            "best_loss_at_cutoff": self.best_loss_at_cutoff,
            "steps_without_improvement": self.steps_without_improvement,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TrainState":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


def make_train_step(model, cfg: TrainConfig, tx) -> Callable:
    """Build the jitted (params, opt_state, batch, cutoff, lr, rng) -> step fn.

    The batch is [accum, B, T] x/y; micro-batches are scanned inside jit so
    one dispatch covers a full optimizer step.
    """

    if cfg.use_fused_block and not (cfg.bicameral or cfg.frequency_native):
        # whole-block Pallas path (models/fused_apply.py): same param tree,
        # one VMEM-resident program per block — standard-block models only
        # (bicameral/frequency-native have different param trees and fall
        # through to the flax path even if the flag is set).  Parity gated
        # in tests/unit/test_pallas_block.py.
        from spectral_tpu.models.fused_apply import fused_lm_apply

        def loss_fn(params, bx, by, cutoff, rng):
            logits = fused_lm_apply(
                params, bx, cfg, cutoff=cutoff,
                deterministic=cfg.dropout == 0.0, rng=rng,
                force_path=getattr(cfg, "fused_force_path", "") or None,
            )
            return cross_entropy(logits, by)
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

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, bx, by, cutoff, lr, rng):
        accum = bx.shape[0]

        # Fold accum into batch when the flat step fits on chip: one
        # backward materializes the grad tree ONCE instead of accum
        # times (+ scan adds) — 27.6 -> 20.2 ms at the flagship recipe.
        # Identical gradients: the mean over [accum*B, T] equals the
        # mean of per-micro means at equal micro sizes.
        flat_ok = (cfg.flatten_accum == "always"
                   or (cfg.flatten_accum == "auto"
                       and bx.size <= cfg.flatten_accum_max_tokens))
        if accum > 1 and flat_ok:
            bx = bx.reshape(1, accum * bx.shape[1], bx.shape[2])
            by = by.reshape(1, by.shape[0] * by.shape[1], by.shape[2])
            accum = 1

        def micro(carry, xs):
            g_acc, l_acc, rng = carry
            mbx, mby = xs
            rng, sub = jax.random.split(rng)
            l, g = jax.value_and_grad(loss_fn)(params, mbx, mby, cutoff, sub)
            g_acc = jax.tree.map(lambda a, b: a + b, g_acc, g)
            return (g_acc, l_acc + l, rng), None

        g0 = jax.tree.map(jnp.zeros_like, params)
        (g, loss_sum, _), _ = jax.lax.scan(micro, (g0, 0.0, rng), (bx, by))
        g = jax.tree.map(lambda a: a / accum, g)
        loss = loss_sum / accum

        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def init_model(cfg: TrainConfig, seed: Optional[int] = None):
    """Initialize model + params. Returns (model, params)."""
    model = FixedSpectralLM(cfg)
    x = jnp.zeros((1, cfg.seq_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed if seed is not None else cfg.seed), x)
    return model, variables["params"]


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def train(cfg: TrainConfig, *, resume: bool = False, no_sawtooth: bool = False,
          no_val: bool = False, log: Callable[[str], None] = _print_flush) -> dict:
    """Full training run.  Returns {"params": ..., "state": ..., "val": ...}."""
    np_rng = np.random.default_rng(cfg.seed)

    corpus = load_corpus_as_u8(cfg.data_path, sanitize=cfg.ascii_only)
    n = int(corpus.shape[0])
    log(f"Corpus bytes: {n:,}")

    val_starts = make_val_starts(n, cfg.seq_len, cfg.val_windows, cfg.seed + 1)
    corpus_blob = corpus.tobytes()

    model, params = init_model(cfg)
    log(f"Params: {count_params(params):,} (~{count_params(params)/1e6:.2f}M)")

    tx = make_optimizer(cfg)
    n_mesh = cfg.mesh_dp * cfg.mesh_sp * cfg.mesh_tp
    if n_mesh > 1:
        # multi-chip: shard the step over a (dp, sp, tp) mesh
        from spectral_tpu.parallel.mesh import make_mesh, shard_params
        from spectral_tpu.parallel.sharded_train import make_sharded_train_step

        mesh = make_mesh(dp=cfg.mesh_dp, sp=cfg.mesh_sp, tp=cfg.mesh_tp)
        log(f"Mesh: dp={cfg.mesh_dp} sp={cfg.mesh_sp} tp={cfg.mesh_tp} over {n_mesh} devices")
        if cfg.mesh_sp > 1:
            # mesh-wired model: the conv routes through the Ulysses
            # all-to-all under sp (same params, different comm pattern)
            model = FixedSpectralLM(cfg, mesh=mesh)
        params = shard_params(params, mesh)
        opt_state = tx.init(params)
        train_step, opt_state = make_sharded_train_step(model, cfg, tx, mesh)(params, opt_state)
        if cfg.use_fused_block:
            from spectral_tpu.parallel.sharded_train import _fused_mesh_mode

            mode = _fused_mesh_mode(cfg, mesh)
            log(f"Fused kernels under the mesh: {mode or 'NOT applicable (flax path)'}")
    else:
        opt_state = tx.init(params)
        train_step = make_train_step(model, cfg, tx)

    state = TrainState()
    if resume:
        import os

        if os.path.exists(cfg.ckpt_path):
            ckpt = load_checkpoint(cfg.ckpt_path)
            params, resized, skipped = load_params_flexible(params, ckpt["params"])
            if resized:
                log(f"[warn] resized {len(resized)} tensors (e.g. {resized[0][0]})")
            if skipped:
                log(f"[warn] skipped {len(skipped)} tensors due to shape mismatch")
            if not (resized or skipped) and "opt_state" in ckpt:
                try:
                    from flax import serialization

                    opt_state = serialization.from_state_dict(opt_state, ckpt["opt_state"])
                except Exception:
                    log("[warn] optimizer state not loaded; starting optimizer fresh")
            state = TrainState.from_dict(ckpt.get("train_state", {}))
            log(f"Resumed from {cfg.ckpt_path} at epoch {state.epoch}")

    freq_bins = cfg.freq_bins
    apply_eval = jax.jit(
        lambda p, x, c: model.apply({"params": p}, x, cutoff=c, deterministic=True)
    )
    apply_gen = lambda p, x, c, length: model.apply(
        {"params": p}, x, cutoff=c, deterministic=True, length=length
    )

    def save(epoch_idx: int):
        from flax import serialization

        save_checkpoint(
            cfg.ckpt_path,
            {
                "params": params,
                # opt_state holds optax namedtuple states; flatten to a plain
                # state dict for msgpack
                "opt_state": serialization.to_state_dict(opt_state),
                "cfg": cfg.to_dict(),
                "train_state": {**state.to_dict(), "epoch": epoch_idx},
            },
        )

    t0 = time.time()
    vloss = float("nan")
    try:
        for epoch in range(state.epoch, cfg.epochs):
            state.epoch = epoch + 1
            cutoff = schedules.curriculum_cutoff(epoch, cfg, freq_bins)
            state.cutoff = cutoff

            losses = []
            running, running_lr = 0.0, 0.0
            for opt_step in range(cfg.steps_per_epoch):
                global_opt_step = epoch * cfg.steps_per_epoch + opt_step
                lr_now = cfg.lr if no_sawtooth else schedules.sawtooth_lr(global_opt_step, epoch, cfg)

                bx = np.empty((cfg.accum_steps, cfg.batch_size, cfg.seq_len), np.int32)
                by = np.empty_like(bx)
                for a in range(cfg.accum_steps):
                    bx[a], by[a] = sample_lm_batch(corpus, cfg.batch_size, cfg.seq_len, np_rng)

                params, opt_state, loss = train_step(
                    params,
                    opt_state,
                    jnp.asarray(bx),
                    jnp.asarray(by),
                    jnp.int32(cutoff),
                    jnp.float32(lr_now),
                    dropout_key(cfg, int(np_rng.integers(2**31))),
                )
                li = float(loss)
                losses.append(li)
                running += li
                running_lr += lr_now
                state.global_step = global_opt_step + 1

                if cfg.log_every_steps and (opt_step + 1) % cfg.log_every_steps == 0:
                    log(
                        f"  step {opt_step+1:5d}/{cfg.steps_per_epoch}  "
                        f"avg_loss={running/cfg.log_every_steps:.4f}  "
                        f"lr={running_lr/cfg.log_every_steps:.6g}  cutoff={cutoff}/{freq_bins}"
                    )
                    running, running_lr = 0.0, 0.0

            avg = sum(losses) / len(losses)
            state.loss_history.extend(losses)

            do_eval = (not no_val) and ((epoch + 1) % cfg.eval_every_epochs == 0 or epoch == 0)
            if do_eval:
                vloss = eval_loss(apply_eval, params, corpus, val_starts, cfg, cutoff, rng=np_rng)
                gap = avg - vloss
            else:
                vloss, gap = float("nan"), float("nan")
            stage_name, lr_mult, min_mult = schedules.lr_stage_params(epoch, cfg)
            log(
                f"Epoch {epoch+1:3d}/{cfg.epochs}  train={avg:.4f}  val={vloss:.4f}  gap={gap:+.4f}"
                f"  cutoff={cutoff}/{freq_bins}  lr_stage={stage_name}"
                f" [{cfg.lr*lr_mult:.2e}->{cfg.lr*min_mult:.2e}]"
                f"  elapsed={(time.time()-t0)/60:.1f}m"
            )

            if do_eval and (epoch + 1) % 25 == 0:
                sample = generate(apply_gen, params, "Once upon a time", cfg, cutoff=cutoff)
                log(safe_console(sample))
                score = parroting_score(corpus_blob, sample.encode("utf-8", errors="ignore"), cfg)
                log(f"[parroting_score] {score:.2f} (0=novel, 1=copied)")

            if (epoch + 1) % cfg.save_every_epochs == 0:
                save(epoch + 1)
    finally:
        if state.epoch > 0:
            save(state.epoch)

    return {"params": params, "state": state, "val": vloss}
