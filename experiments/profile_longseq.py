"""Train-step timing across sequence lengths and widths through the fused
dispatch (whole-block kernel <=2048, conv+tail route beyond) — the round-3
"no cliff" claim, measured.

Each case reports ms/step and tokens/sec at a constant-tokens-per-step
recipe (32768 tokens where memory allows) with the CLAUDE.md timing rules
(one jit, fori-loop, marginal cost, value-fetch sync).

Run (chip, background, ~10 min of compiles per new case):
    python -m experiments.profile_longseq [--cases flagship,seq2048,seq4096,seq8192,d1024]
"""

from __future__ import annotations

import argparse
import time

CASES = {
    # name: (d_model, n_layers, seq_len, batch, accum)
    "flagship": (512, 6, 1024, 4, 8),   # 32768 tok/step, whole-block kernel
    "seq2048": (512, 6, 2048, 4, 4),    # 32768 tok/step, tail (block misfits at d512)
    "seq4096": (512, 6, 4096, 4, 2),    # 32768 tok/step, tail + matmul-FFT conv
    "seq8192": (512, 6, 8192, 2, 2),    # 32768 tok/step, tail + matmul-FFT conv
    "d1024": (1024, 6, 1024, 4, 4),     # 16384 tok/step, tail (block misfits at d1024)
    "seq16384": (512, 6, 16384, 1, 2),  # 32768 tok/step, tail + matmul-FFT conv
    # 32x/64x the reference's max context (README.md:254-261 recommends
    # seq 2048 as its 24 GB ceiling); batch 1, accum 1 — the per-micro
    # working set (n_fft 65536/131072 complex64 activations) is what has
    # to fit, so tokens/step drops below the constant-token recipe here.
    "seq32768": (512, 6, 32768, 1, 1),
    "seq65536": (512, 6, 65536, 1, 1),
}


def bench_case(name, d, L, T, B, A, iters=30, tail_conv="auto",
               force_path="", flatten="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.models.fused_apply import fused_path_for
    from spectral_tpu.train.trainer import (
        dropout_key,
        init_model,
        make_optimizer,
        make_train_step,
    )

    cfg = TrainConfig(
        d_model=d, n_layers=L, seq_len=T, kernel_len=128, batch_size=B,
        accum_steps=A, use_fused_block=True, compute_dtype="bfloat16",
        tail_conv_backend=tail_conv, fused_force_path=force_path,
        flatten_accum=flatten,
    )
    path = force_path or fused_path_for(T, d, 2 * d)
    if path == "tail" and tail_conv != "auto":
        path = f"tail/{tail_conv}"
    model, params = init_model(cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, cfg, tx)

    rng = np.random.default_rng(0)
    shape = (A, B, T)
    batches = [
        (jnp.asarray(rng.integers(0, 256, shape).astype(np.int32)),
         jnp.asarray(rng.integers(0, 256, shape).astype(np.int32)))
        for _ in range(3)
    ]
    cutoff, lr = jnp.int32(d), jnp.float32(2e-4)
    key = dropout_key(cfg, 0)

    def loop(params, opt_state, bx, by, n):
        def body(i, c):
            p, o, _ = c
            p, o, loss = step(p, o, bx, by, cutoff, lr, jax.random.fold_in(key, i))
            return (p, o, loss)

        _, _, loss = jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))
        return loss

    run = jax.jit(loop, static_argnums=4)
    bx, by = batches[0]
    float(run(params, opt_state, bx, by, 1))
    float(run(params, opt_state, bx, by, iters))

    def timed(n, reps=2):
        best = float("inf")
        for r in range(reps):
            bxx, byy = batches[(n + r) % 3]
            t0 = time.perf_counter()
            float(run(params, opt_state, bxx, byy, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(iters) - timed(1), 1e-9) / (iters - 1)
    tok = A * B * T
    fold = (flatten != "never" and A > 1
            and A * B * T <= cfg.flatten_accum_max_tokens)
    print(f"{name:<10} d{d} x{L} T{T:>5} {A}x{B} ({tok} tok/step) "
          f"path={path:<5} fold={'Y' if fold else 'n'} "
          f"{dt*1e3:8.2f} ms/step  {tok/dt:>12,.0f} tok/s",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="seq8192,d1024")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tail-conv", default="auto",
                    help="override cfg.tail_conv_backend for the tail route "
                         "(comma list runs an A/B, e.g. 'direct,pallas')")
    ap.add_argument("--force-path", default="",
                    choices=["", "block", "tail"],
                    help="override the block/tail route dispatch (the "
                         "whole-block-vs-tail crossover A/B at seq<=2048)")
    ap.add_argument("--flatten", default="auto", choices=["auto", "never"],
                    help="cfg.flatten_accum: the r5 audit found the fold "
                         "and the conv backend INTERACT (direct degrades "
                         "folded, pallas improves) — A/B both")
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    for name in args.cases.split(","):
        d, L, T, B, A = CASES[name.strip()]
        for be in args.tail_conv.split(","):
            bench_case(name.strip(), d, L, T, B, A, iters=args.iters,
                       tail_conv=be.strip(), force_path=args.force_path,
                       flatten=args.flatten)


if __name__ == "__main__":
    main()
