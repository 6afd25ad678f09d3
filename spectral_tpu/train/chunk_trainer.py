"""Chunk-head training loops ("piston engine" training).

Generalizes the reference's four chunk trainers into one parameterized loop:

* scripts/train_chunk_head.py — ChunkLM (+optional EMA), epoch-level
  ``adaptive_cutoff`` plateau detection, resume-without-regressing.
* scripts/train_bicameral.py  — bicameral backbone + PhaseClockChunkLM,
  step-level ``plateau_cutoff`` achievement mode, LR halving on unlock,
  autosave every N steps, hemisphere-balance logging.
* scripts/train_dual_head.py  — bicameral backbone + TokenAwareChunkLM with
  GPT-2 BPE teacher supervision (optional transformers dep).
* scripts/train_frequency_native.py — frequency-native backbone, fp32.

Head-specific losses stay in their model modules; this file owns the loop,
curriculum state machine, checkpointing and resume semantics.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.chunk_head import ChunkLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.models.dual_head import (
    TokenAwareChunkLM,
    compute_dual_loss,
    get_gpt2_tokenizer,
    get_token_ids_fast,
)
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
from spectral_tpu.train import schedules
from spectral_tpu.train.ckpt import (
    detect_architecture,
    load_checkpoint,
    load_params_flexible,
    save_checkpoint,
)
from spectral_tpu.train.data import load_corpus_as_u8, sample_chunk_batch
from spectral_tpu.train.evaluate import cross_entropy
from spectral_tpu.train.trainer import TrainState, count_params, dropout_key, make_optimizer


HEADS = ("chunk", "phase_clock", "dual", "segmentation")


def _print_flush(s: str) -> None:
    print(s, flush=True)


def build_chunk_model(cfg: TrainConfig, head: str, chunk: int, *, use_ema: bool = False,
                      ema_mode: str = "aligned", token_vocab_size: int = 50257):
    backbone = FixedSpectralLM(cfg)
    if head == "chunk":
        return ChunkLM(backbone=backbone, chunk=chunk, use_ema=use_ema, ema_mode=ema_mode)
    if head == "phase_clock":
        return PhaseClockChunkLM(backbone=backbone, chunk=chunk)
    if head == "dual":
        return TokenAwareChunkLM(backbone=backbone, chunk=chunk, token_vocab_size=token_vocab_size)
    if head == "segmentation":
        return SegmentedChunkLM(backbone=backbone, chunk=chunk)
    raise ValueError(f"unknown head {head!r}: expected one of {HEADS}")


def make_chunk_train_step(model, cfg: TrainConfig, tx, head: str):
    """Jitted (params, opt_state, bx, by, aux, cutoff, lr, rng) -> update.

    ``aux`` is the head-specific target tensor (phase targets, token ids,
    boundary labels) or a dummy zeros array for the plain chunk head.
    """

    def loss_fn(params, bx, by, aux, cutoff, rng):
        rngs = None if cfg.dropout == 0.0 else {"dropout": rng}
        det = cfg.dropout == 0.0
        if head == "chunk":
            logits = model.apply({"params": params}, bx, cutoff=cutoff, deterministic=det, rngs=rngs)
            loss = cross_entropy(logits, by)
            return loss, (loss, jnp.float32(0.0))
        if head == "phase_clock":
            logits, phase = model.apply({"params": params}, bx, cutoff=cutoff, deterministic=det, rngs=rngs)
            total, cl, al = compute_phase_clock_loss(logits, phase, by, aux)
            return total, (cl, al)
        if head == "dual":
            logits, tok = model.apply({"params": params}, bx, cutoff=cutoff, deterministic=det, rngs=rngs)
            total, cl, al = compute_dual_loss(logits, tok, by, aux)
            return total, (cl, al)
        if head == "segmentation":
            logits, seg = model.apply({"params": params}, bx, cutoff=cutoff, deterministic=det, rngs=rngs)
            total, cl, al = compute_segmented_loss(logits, seg, by, aux)
            return total, (cl, al)
        raise AssertionError(head)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, bx, by, aux, cutoff, lr, rng):
        (total, (char_loss, aux_loss)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bx, by, aux, cutoff, rng
        )
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, char_loss, aux_loss

    return step


def train_chunk(
    cfg: TrainConfig,
    *,
    head: str = "chunk",
    chunk: int = 16,
    use_ema: bool = False,
    cutoff_mode: str = "adaptive",  # "adaptive" (epoch) | "plateau" (step)
    lr_halving_on_unlock: bool = False,
    autosave_steps: int = 0,
    resume: bool = False,
    token_vocab_size: int = 50257,
    log: Callable[[str], None] = _print_flush,
) -> dict:
    """The shared chunk-training loop (see module docstring for the map to
    the reference trainers)."""
    assert head in HEADS
    np_rng = np.random.default_rng(cfg.seed)

    corpus = load_corpus_as_u8(cfg.data_path, sanitize=cfg.ascii_only)
    log(f"Corpus bytes: {corpus.shape[0]:,}")

    tokenizer = None
    if head == "dual":
        tokenizer = get_gpt2_tokenizer()
        if tokenizer is None:
            from spectral_tpu.models.dual_head import HashWordTokenizer

            tokenizer = HashWordTokenizer(token_vocab_size)
            log("[warn] transformers/gpt2 unavailable — using the offline "
                "word-hash teacher (exact word-span alignment)")

    model = build_chunk_model(cfg, head, chunk, use_ema=use_ema, token_vocab_size=token_vocab_size)
    x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(cfg.seed), x0)["params"]
    log(f"Params: {count_params(params):,} (~{count_params(params)/1e6:.2f}M) head={head}")

    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step_fn = make_chunk_train_step(model, cfg, tx, head)

    state = TrainState(cutoff=128)
    lr_scale = 1.0
    if resume:
        import os

        if os.path.exists(cfg.ckpt_path):
            ckpt = load_checkpoint(cfg.ckpt_path)
            params, resized, skipped = load_params_flexible(params, ckpt["params"])
            state = TrainState.from_dict(ckpt.get("train_state", {}))
            arch = detect_architecture(ckpt["params"])
            log(f"Resumed epoch={state.epoch} cutoff={state.cutoff} (arch sniff: "
                + ", ".join(k for k, v in arch.items() if v) + ")")
            # "don't regress": cutoff restored from ckpt, never lowered
            if not (resized or skipped) and "opt_state" in ckpt:
                try:
                    from flax import serialization

                    opt_state = serialization.from_state_dict(opt_state, ckpt["opt_state"])
                except Exception:
                    log("[warn] optimizer state not loaded; fresh optimizer")

    freq_bins = cfg.freq_bins
    cutoff = min(max(state.cutoff, 128), freq_bins)
    best_loss = state.best_loss_at_cutoff
    stall = state.steps_without_improvement
    recent: list[float] = []
    cutoff_raised_this_step = False

    def save(epoch_idx: int):
        from flax import serialization

        state.cutoff = cutoff
        state.best_loss_at_cutoff = best_loss
        state.steps_without_improvement = stall
        save_checkpoint(
            cfg.ckpt_path,
            {
                "params": params,
                "opt_state": serialization.to_state_dict(opt_state),
                "cfg": cfg.to_dict(),
                "train_state": {**state.to_dict(), "epoch": epoch_idx},
                "head": head,
                "chunk": chunk,
            },
        )

    t0 = time.time()
    try:
        for epoch in range(state.epoch, cfg.epochs):
            state.epoch = epoch + 1
            if cutoff_mode == "adaptive":
                new_cutoff, raised = schedules.adaptive_cutoff(epoch, cutoff, recent, freq_bins)
                if raised:
                    log(f"[curriculum] plateau detected -> cutoff {cutoff} -> {new_cutoff}")
                    cutoff = new_cutoff
                    cutoff_raised_this_step = True

            losses = []
            for opt_step in range(cfg.steps_per_epoch):
                gstep = epoch * cfg.steps_per_epoch + opt_step
                lr_now = schedules.sawtooth_lr(gstep, epoch, cfg, cutoff_raised=cutoff_raised_this_step)
                lr_now *= lr_scale
                cutoff_raised_this_step = False

                bx, by = sample_chunk_batch(corpus, cfg.batch_size, cfg.seq_len, chunk, np_rng)
                if head == "phase_clock":
                    aux = generate_phase_targets(bx)
                elif head == "segmentation":
                    aux = get_word_boundaries(bx)
                elif head == "dual":
                    aux = (
                        get_token_ids_fast(bx, tokenizer)
                        if tokenizer is not None
                        else np.zeros_like(bx)  # all-padding -> token loss masked out
                    )
                else:
                    aux = np.zeros((1,), np.float32)

                params, opt_state, total, char_l, aux_l = step_fn(
                    params,
                    opt_state,
                    jnp.asarray(bx),
                    jnp.asarray(by),
                    jnp.asarray(aux),
                    jnp.int32(cutoff),
                    jnp.float32(lr_now),
                    dropout_key(cfg, int(np_rng.integers(2**31))),
                )
                li = float(total)
                losses.append(li)
                recent.append(li)
                state.global_step = gstep + 1

                if cutoff_mode == "plateau":
                    recent_avg = float(np.mean(recent[-10:]))
                    cutoff, raised, best_loss, stall = schedules.plateau_cutoff(
                        cutoff, recent_avg, freq_bins, best_loss, stall
                    )
                    if raised:
                        log(
                            f"[curriculum] UNLOCK at step {gstep}: cutoff -> {cutoff}"
                            + (" (LR halved)" if lr_halving_on_unlock else "")
                        )
                        cutoff_raised_this_step = True
                        if lr_halving_on_unlock:
                            lr_scale *= 0.5

                if autosave_steps and (gstep + 1) % autosave_steps == 0:
                    save(epoch)

                if cfg.log_every_steps and (opt_step + 1) % cfg.log_every_steps == 0:
                    log(
                        f"  step {opt_step+1:5d}/{cfg.steps_per_epoch} loss={li:.4f} "
                        f"char={float(char_l):.4f} aux={float(aux_l):.4f} "
                        f"lr={lr_now:.3g} cutoff={cutoff}/{freq_bins}"
                    )

            avg = float(np.mean(losses))
            log(
                f"Epoch {epoch+1:3d}/{cfg.epochs}  train={avg:.4f}  cutoff={cutoff}/{freq_bins}"
                f"  elapsed={(time.time()-t0)/60:.1f}m"
            )
            if cfg.bicameral and head == "phase_clock":
                _log_hemisphere_balance(params, log)

            if (epoch + 1) % cfg.save_every_epochs == 0:
                save(epoch + 1)
    except KeyboardInterrupt:
        log("[interrupt] saving checkpoint before exit")
        save(state.epoch)
        raise
    finally:
        if state.epoch > 0:
            save(state.epoch)

    return {"params": params, "state": state, "cutoff": cutoff}


def _log_hemisphere_balance(params, log):
    """Hemisphere balance bars (reference: bicameral.py:326-388)."""
    from spectral_tpu.models.bicameral import hemisphere_balance

    for name, sub in params.items():
        if name.startswith("backbone") or name.startswith("block"):
            tree = sub
            for bname, block in (tree.items() if "alpha_freq" not in tree else [(name, tree)]):
                if isinstance(block, dict) and "alpha_freq" in block:
                    w = hemisphere_balance(block)
                    bar_f = "#" * int(w["w_freq"] * 40)
                    bar_t = "#" * int(w["w_time"] * 40)
                    log(f"  [{bname}] freq {w['w_freq']:.1%} {bar_f}")
                    log(f"  [{bname}] time {w['w_time']:.1%} {bar_t}")
