"""Descent-parity gate for a candidate fast training configuration.

Trains the SAME model (identical init, identical batch stream, identical
optimizer) under two configurations — the trusted reference path
(``fft_backend="matmul"``, fp32 compute) and a candidate fast path — and
reports the loss-trajectory divergence at matched steps.  This is the gate
a configuration must pass before becoming the TPU training default
(mirrors the role of the reference's AMP-vs-fp32 sanity runs,
reference fft_lm/train_fixed_full.py:822,929 — AMP is its default only
because descent matched fp32).

Usage:
    python -m experiments.backend_descent_check [--steps 150] [--data PATH]
        [--candidate-backend direct] [--candidate-dtype bfloat16]

Run on the real chip; CPU works for a smoke test with tiny --steps.
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--data", default="data/code_corpus/train.txt")
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--n-layers", type=int, default=6)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--accum-steps", type=int, default=2)
    ap.add_argument("--candidate-backend", default="direct")
    ap.add_argument("--candidate-dtype", default="bfloat16")
    ap.add_argument("--tail-conv", default="auto",
                    choices=["auto", "direct", "matmul", "pallas"],
                    help="tail_conv_backend for the fused candidate "
                         "(seq>2048 routes; ignored otherwise)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.data import load_corpus_as_u8, sample_lm_batch
    from spectral_tpu.train.trainer import (
        dropout_key,
        init_model,
        make_optimizer,
        make_train_step,
    )

    corpus = load_corpus_as_u8(args.data)
    base = dict(
        d_model=args.d_model,
        n_layers=args.n_layers,
        seq_len=args.seq_len,
        kernel_len=128,
        batch_size=args.batch_size,
        accum_steps=args.accum_steps,
        seed=0,
    )
    ref_cfg = TrainConfig(**base, fft_backend="matmul", compute_dtype="float32",
                          fft_precision="highest")
    if args.candidate_backend == "fused":
        # the whole-block Pallas kernel path (cfg.use_fused_block)
        cand_cfg = TrainConfig(**base, use_fused_block=True,
                               compute_dtype=args.candidate_dtype,
                               fft_precision="default",
                               tail_conv_backend=args.tail_conv)
    else:
        cand_cfg = TrainConfig(**base, fft_backend=args.candidate_backend,
                               compute_dtype=args.candidate_dtype,
                               fft_precision="default")

    # one shared batch stream: both runs see byte-identical data
    np_rng = np.random.default_rng(123)
    A, B, T = base["accum_steps"], base["batch_size"], base["seq_len"]
    batches = []
    for _ in range(args.steps):
        bx, by = sample_lm_batch(corpus, A * B, T, np_rng)
        batches.append((bx.reshape(A, B, T), by.reshape(A, B, T)))

    cutoff = jnp.int32(args.d_model)
    lr = jnp.float32(3e-4)

    def run(cfg, tag):
        from spectral_tpu.ops import matfft

        matfft.set_precision(
            jax.lax.Precision.HIGHEST if cfg.fft_precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
        model, params = init_model(cfg)
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)
        step = make_train_step(model, cfg, tx)  # already jitted + donated
        losses = []
        for i, (bx, by) in enumerate(batches):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(bx), jnp.asarray(by), cutoff, lr,
                jax.random.fold_in(dropout_key(cfg, 0), i),
            )
            if i % 10 == 0 or i == args.steps - 1:
                losses.append((i, float(loss)))
                print(f"  [{tag}] step {i:4d}  loss {losses[-1][1]:.5f}", flush=True)
        return losses

    print(f"reference path: matmul fp32 (HIGHEST) — {args.steps} steps", flush=True)
    ref = run(ref_cfg, "ref ")
    print(f"candidate path: {args.candidate_backend} {args.candidate_dtype} (DEFAULT)", flush=True)
    cand = run(cand_cfg, "cand")

    rels = [abs(c - r) / max(abs(r), 1e-9) for (_, r), (_, c) in zip(ref, cand)]
    print("\nstep   ref_loss   cand_loss  rel_diff")
    for (s, r), (_, c), rd in zip(ref, cand, rels):
        print(f"{s:5d}  {r:9.5f}  {c:9.5f}  {rd*100:6.2f}%")
    print(f"\nmax rel divergence: {max(rels)*100:.2f}%  "
          f"final: ref {ref[-1][1]:.5f} vs cand {cand[-1][1]:.5f}")


if __name__ == "__main__":
    main()
