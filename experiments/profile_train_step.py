"""Ablation profile of the flagship train step (roadmap round-3 item 1).

Times the FULL jitted optimizer step (d512 x 6, seq 1024, batch 4 x accum 8)
and ablated variants to attribute the ms/step between the spectral conv,
the FFN, the logits/loss head, and the optimizer — using the tunnel-safe
methodology from bench.py (one fori_loop program, marginal cost, value-fetch
sync).

Usage:  python -m experiments.profile_train_step [--iters 30]
Run on the real chip (no JAX_PLATFORMS override).
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timed_step(step, params, opt_state, bx, by, iters, key=None):
    cutoff = jnp.int32(512)
    lr = jnp.float32(2e-4)
    if key is None:
        key = jax.random.PRNGKey(0)

    def loop(params, opt_state, bx, by, n):
        def body(i, carry):
            p, o, _ = carry
            p, o, loss = step(p, o, bx, by, cutoff, lr, jax.random.fold_in(key, i))
            return (p, o, loss)

        _, _, loss = jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))
        return loss

    run = jax.jit(loop, static_argnums=4)
    float(run(params, opt_state, bx, by, 1))
    float(run(params, opt_state, bx, by, iters))

    def timed(n, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, opt_state, bx, by, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(iters) - timed(1), 1e-9) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--precision", default="default", choices=["default", "highest"])
    ap.add_argument("--filter", default=None,
                    help="only run variants whose name contains this substring "
                         "(e.g. FUSED for the round-4 attribution set)")
    args = ap.parse_args()

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.ops import matfft
    from spectral_tpu.train.trainer import (
        dropout_key,
        init_model,
        make_optimizer,
        make_train_step,
    )

    matfft.set_precision(
        jax.lax.Precision.DEFAULT if args.precision == "default" else jax.lax.Precision.HIGHEST
    )

    rng = np.random.default_rng(0)

    def build(cfg):
        model, params = init_model(cfg)
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)
        step = make_train_step(model, cfg, tx)
        shape = (cfg.accum_steps, cfg.batch_size, cfg.seq_len)
        bx = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
        return (step, params, opt_state, bx, by), dropout_key(cfg, 0)

    base = dict(
        d_model=512, n_layers=6, seq_len=1024, kernel_len=128,
        batch_size=4, accum_steps=8, fft_backend="matmul",
    )

    # round-4 attribution additions (VERDICT r3 next #3): where do the
    # default path's 27.5 ms go?  fwd-only isolates backward cost; sgd
    # isolates the adamw update; flat batch isolates the accum scan; the
    # 0-layer line isolates embed+logits+loss+opt.
    fused = {**base, "use_fused_block": True, "compute_dtype": "bfloat16"}
    variants = [
        ("FUSED whole-block Pallas + bf16", dict(fused)),
        ("FUSED fwd-only (loss, no grad)", {**fused, "_fwd_only": True}),
        ("FUSED + sgd (adamw cost delta)", {**fused, "_sgd": True}),
        ("FUSED flat accum=1 batch=32", {**fused, "accum_steps": 1, "batch_size": 32}),
        # 0 layers: embed+logits+loss+opt only — no blocks, so the fused
        # dispatch is moot (fused_lm_apply requires >=1 block); flax path
        # is identical here
        ("FUSED 0 layers (fixed costs)",
         {**fused, "n_layers": 0, "use_fused_block": False}),
        ("FUSED whole-block, no dropout", {**base, "use_fused_block": True, "compute_dtype": "bfloat16", "dropout": 0.0}),
        ("full step, DIRECT toeplitz conv (rbg)", {**base, "fft_backend": "direct"}),
        ("full step, DIRECT + bf16 compute", {**base, "fft_backend": "direct", "compute_dtype": "bfloat16"}),
        ("full step (rbg dropout)", base),
        ("full step (threefry dropout)", {**base, "dropout_prng": "threefry2x32"}),
        ("full step (no dropout)", {**base, "dropout": 0.0}),
        ("flat accum=1 batch=32 (rbg)", {**base, "accum_steps": 1, "batch_size": 32}),
        ("full step (bf16 compute_dtype, rbg)", {**base, "compute_dtype": "bfloat16"}),
        ("0 layers (embed+logits+opt only)", {**base, "n_layers": 0}),
    ]

    results = {}
    for name, kw in variants:
        if kw is None:
            continue
        if args.filter and args.filter not in name:
            continue
        kw = dict(kw)
        fwd_only = kw.pop("_fwd_only", False)
        use_sgd = kw.pop("_sgd", False)
        cfg = TrainConfig(**kw)
        built, key = build(cfg)
        if use_sgd:
            import optax

            from spectral_tpu.train.trainer import make_train_step

            _, params, _, bx, by = built
            model, _ = init_model(cfg)
            tx = optax.inject_hyperparams(optax.sgd)(learning_rate=2e-4)
            built = (make_train_step(model, cfg, tx), params,
                     tx.init(params), bx, by)
        if fwd_only:
            # time ONLY the forward+loss of the accum scan: a step that
            # scans loss_fn over the micro-batches without grads/update
            from spectral_tpu.models.fused_apply import fused_lm_apply
            from spectral_tpu.train.evaluate import cross_entropy

            _, params, opt_state, bx, by = built

            def fwd_step(p, o, bx, by, cutoff, lr, rng):
                def micro(carry, xs):
                    l_acc, rng = carry
                    mbx, mby = xs
                    rng, sub = jax.random.split(rng)
                    logits = fused_lm_apply(p, mbx, cfg, cutoff=cutoff,
                                            deterministic=cfg.dropout == 0.0,
                                            rng=sub)
                    return (l_acc + cross_entropy(logits, mby), rng), None

                (l, _), _ = jax.lax.scan(micro, (jnp.float32(0), rng), (bx, by))
                # mutate p trivially so the fori_loop carry never fixes
                p = jax.tree.map(lambda a: a * (1.0 - 1e-12 * l), p)
                return p, o, l / bx.shape[0]

            built = (fwd_step, params, opt_state, bx, by)
        dt = timed_step(*built, iters=args.iters, key=key)
        results[name] = dt * 1e3
        print(f"{name:45s} {dt*1e3:7.2f} ms/step", flush=True)

    if "full step (rbg dropout)" in results and "0 layers (embed+logits+opt only)" in results:
        per_layer = (results["full step (rbg dropout)"] - results["0 layers (embed+logits+opt only)"]) / 6
        print(f"\nper-layer cost ((6-layer - 0-layer)/6): {per_layer:.2f} ms")
        print(f"fixed cost (embed+logits+loss+opt)    : {results['0 layers (embed+logits+opt only)']:.2f} ms")


if __name__ == "__main__":
    main()
