"""Attribute the exact decoder's per-token cost (ROADMAP r3 stretch:
"serving is scan-latency-bound") — measure WHERE the ~0.5 ms/token at B=8
goes before building a fused decode kernel.

Variants (all scan ``n`` tokens inside ONE jit, marginal cost t(N)-t(1),
value-fetch sync — the CLAUDE.md chip-timing rules):

  full        OverlapSaveBatch._token_step as shipped ([N,T,C] bufs)
  layout-ct   same math, bufs stored [N,C,T] (tap contraction on lanes)
  no-write    conv read WITHOUT the buffer DUS write (attribution only —
              NOT exact; isolates the scan-carry copy cost, if any)
  conv-only   conv dot + residual only (drops gates + FFN + final logits)
  sampler     DeviceSampler penalty stack alone (no backbone)

Run (chip, background; ~2 min compile per variant):
    python -m experiments.profile_decode [--batches 8 32 128] [--tokens 512]

Chip results — ROUND 5, per-lane-phase design (d512x6 K128 artifact,
512-token scans, min of 3; "bound" = 6-layer [N, T, C] window-read
HBM time at 819 GB/s — every token's tap-dot + pooled mean must read
all six window buffers):

    B=8    full  25.4 us/tok (bound 122.9 -> 4.84x)   bf16 20.2 (3.04x)
    B=32   full 491.7 us/tok (bound 491.6 -> 1.00)    bf16 173.4 (1.42x)
    B=128  full 2296.9 us/tok (bound 1966.6 -> 0.86)  bf16 1192.8 (0.82)
    sampler alone: 12.3-41.8 us/token

Findings (BENCHMARKS.md round-5 decode roofline):
  1. the exact decoder is WINDOW-READ-BANDWIDTH-BOUND at fleet batch:
     B=32 fp32 sits at exactly 1.00 of the roofline; B=128 at 0.86
     (the residue is the sampler 42 us + tap-row rolls + logits).  No
     MXU restructure of the [N,T,C] x [2,T] tap-dot can recover the
     2.4x-off-FIR gap — FIR reads a K=128 ring, exact reads T=1024
     windows, and the byte ratio IS the throughput ratio (VERDICT r4
     weak #1 resolved by physics, not kernel work).
  2. fractions >1 at B<=8/bf16-32 mean the bound does not bind — the
     100-201 MB working set partially caches; small fleets ride it.
  3. bf16 window buffers halve the bound and deliver 1.9-2.8x measured
     (the r3 "bf16 buys nothing" verdict was an artifact of the
     global-ptr design; the per-lane-phase layout consumes bf16 fine).
  4. r3-era header numbers (full 1158.3 at B=128) are NOT a valid
     baseline for the per-lane cost: 1158 us is BELOW the 1967 us
     fp32 window-read bound, so that measurement itself violated the
     roofline (value-cache or hoisting artifact of the shared-ptr
     design's repeated inputs).  The honest per-lane-phase price is the
     r4 amendment's B=32 A/B (0.42 -> 0.54 ms/token, ~1.2x), both
     sides of which respect their bounds.

Historical (r3 global-ptr design): [N,C,T] layout 3.5x worse (cross-
lane scatter on the token write) — the [N,T,C] choice stands.

NOTE --tokens 64 is too small: the marginal (t(N)-t(1)) sits inside the
multi-ms tunnel RTT jitter and produces nonsense (negative sampler
times).  512+ makes device time dominate.
"""

from __future__ import annotations

import argparse
import time


def build_variants(params, cfg):
    import jax
    import jax.numpy as jnp

    from spectral_tpu.streaming.fir import DeviceSampler, _ffn, _layernorm
    from spectral_tpu.streaming.overlap_save_batch import OverlapSaveBatch

    dec = OverlapSaveBatch(params, cfg)
    dec16 = OverlapSaveBatch(params, cfg, buf_dtype="bfloat16")
    params = dec.params  # jnp-converted tree (ckpt trees are numpy)
    T, L = dec.T, dec.n_layers
    taps_list = [dec._layer_taps(params[f"block_{i}"]) for i in range(L)]

    def step_full(state, x_id):
        return dec._token_step(params, state, x_id)

    def step_bf16(state, x_id):
        return dec16._token_step(dec16.params, state, x_id)

    def block_ct(bp, taps, x_t, buf_ct, ptr, *, write=True, tail=True):
        # buf_ct: [N, C, T] — tap contraction along the minor (lane) dim
        xn = _layernorm(x_t, bp["ln"]["scale"], bp["ln"]["bias"])
        if write:
            buf_ct = jax.lax.dynamic_update_slice(
                buf_ct, xn[:, :, None], (0, 0, ptr))
        w = jnp.roll(taps[::-1], ptr + 1)
        R = jnp.stack([w, jnp.full((T,), 1.0 / T, jnp.float32)])  # [2, T]
        res = jnp.einsum("nct,rt->nrc", buf_ct, R)
        y_raw, pooled = res[:, 0, :], res[:, 1, :]
        if not tail:
            return x_t + y_raw, buf_ct
        g_ctx = jax.nn.sigmoid(
            pooled @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        y = y_raw * (bp["gain"][None, :] * g_ctx)
        return _ffn(bp["ffn"], x_t + y), buf_ct

    def make_step_ct(write=True, tail=True, logits=True):
        def step(state, x_id):
            bufs, ptr = state
            h = params["embed"]["embedding"][x_id]
            new_bufs = []
            for i in range(L):
                h, b = block_ct(params[f"block_{i}"], taps_list[i], h,
                                bufs[i], ptr, write=write, tail=tail)
                new_bufs.append(b)
            if logits:
                h = _layernorm(h, params["ln_f"]["scale"],
                               params["ln_f"]["bias"])
                h = h @ params["embed"]["embedding"].T
            else:
                h = h[:, :256]
            return (new_bufs, (ptr + 1) % T), h

        return step

    sampler = DeviceSampler(cfg)
    return dec, {
        "full": ("tc", step_full),
        "full-bf16": ("tc16", step_bf16),
        "layout-ct": ("ct", make_step_ct()),
        "no-write": ("ct", make_step_ct(write=False)),
        "conv-only": ("ct", make_step_ct(tail=False, logits=False)),
    }, sampler


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/code_d512x6.msgpack")
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 128])
    ap.add_argument("--tokens", type=int, default=512)  # 64 sits inside
    # tunnel RTT jitter and measures nothing (module NOTE)
    ap.add_argument(
        "--variants",
        default="full,full-bf16,layout-ct,no-write,conv-only,sampler")
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.ckpt import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    cfg = TrainConfig(**{**ckpt["cfg"], "dropout": 0.0})
    params = ckpt["params"]
    dec, variants, sampler = build_variants(params, cfg)
    T = dec.T
    want = [v.strip() for v in args.variants.split(",")]

    for B in args.batches:
        ids = np.random.default_rng(0).integers(32, 127, (B, T)).astype(np.int32)
        state0_full, logits0 = dec.init_state(ids)
        bufs, ptrs, ws = state0_full  # per-lane ptrs [N] + tap rows (round 4)
        ptr = jnp.int32(0)  # ct variants keep the legacy scalar-phase layout

        seq = iter(range(33, 127))  # distinct token per dispatch: the
        # tunneled chip serves REPEATED (executable, inputs) pairs from a
        # value cache (CLAUDE.md rule 1) — never reuse an input

        def timed(fn, n):
            # fn(n, tok) -> float forces a VALUE fetch (true sync on the
            # tunneled chip; block_until_ready under-reports)
            best = float("inf")
            for _ in range(3):
                tok = next(seq)
                t0 = time.perf_counter()
                fn(n, tok)
                best = min(best, time.perf_counter() - t0)
            return best

        for name in want:
            if name == "sampler":
                continue
            layout, step = variants[name]
            if layout == "tc":
                b = bufs
                state0 = (b, ptrs, ws)
            elif layout == "tc16":
                b = [x.astype(jnp.bfloat16) for x in bufs]
                state0 = (b, ptrs, ws)
            else:
                b = [jnp.swapaxes(x, 1, 2) for x in bufs]
                state0 = (b, ptr)

            def run(state0, tok0, n, step=step):
                def body(c, x):
                    st, tok = c
                    st, lg = step(st, tok)
                    tok = jnp.argmax(lg[:, :256], axis=-1).astype(jnp.int32)
                    return (st, tok), lg[0, 0]

                (_, _), out = jax.lax.scan(
                    body, (state0, jnp.full((B,), tok0, jnp.int32)), None,
                    length=n)
                return jnp.sum(out)

            runj = jax.jit(run, static_argnums=2)
            float(runj(state0, 32, 1)), float(runj(state0, 32, args.tokens))
            dt1 = timed(lambda n, t: float(runj(state0, t, n)), 1)
            dtN = timed(lambda n, t: float(runj(state0, t, n)), args.tokens)
            per = (dtN - dt1) / (args.tokens - 1)
            # window-traffic roofline (VERDICT r4 next #3): every token's
            # tap-dot + pooled mean must READ all L per-layer [N, T, C]
            # window buffers from HBM (1.6 GB at B=128 fp32 — far >VMEM);
            # the write side is one [N, C] row per layer (negligible).
            # fraction > 1 would mean the harness lied (CLAUDE.md rule).
            bpe = 2 if layout == "tc16" else 4
            win_bytes = cfg.n_layers * B * T * cfg.d_model * bpe
            from spectral_tpu.utils.profiling import HBM_PEAK_GBPS, detect_chip

            bound = win_bytes / (HBM_PEAK_GBPS[detect_chip()] * 1e9)
            print(f"B={B:<4} {name:<10} {per*1e6:9.1f} us/token "
                  f"({B/per:,.0f} bytes/s fleet)  window-read bound "
                  f"{bound*1e6:7.1f} us -> {bound/per:5.2f} of roofline",
                  flush=True)

        if "sampler" in want:
            samp_states = jax.tree.map(
                lambda *l: jnp.stack(l), *[sampler.init_state([32]) for _ in range(B)])

            def run_s(logits0, samp_states, seed, n):
                def body(c, x):
                    lg, ss, rng = c
                    l = jax.vmap(sampler.process_logits)(lg, ss)
                    rng, sub = jax.random.split(rng)
                    subs = jax.random.split(sub, B)
                    nxt, ss = jax.vmap(sampler.draw_and_update)(subs, l, ss)
                    lg = lg + nxt[:, None] * 1e-6  # keep the chain live
                    return (lg, ss, rng), nxt[0]

                (_, _, _), out = jax.lax.scan(
                    body, (logits0, samp_states, jax.random.PRNGKey(seed)),
                    None, length=n)
                return jnp.sum(out)

            runj = jax.jit(run_s, static_argnums=3)
            float(runj(logits0, samp_states, 0, 1))
            float(runj(logits0, samp_states, 0, args.tokens))
            dt1 = timed(lambda n, t: float(runj(logits0, samp_states, t, n)), 1)
            dtN = timed(
                lambda n, t: float(runj(logits0, samp_states, t, n)),
                args.tokens)
            per = (dtN - dt1) / (args.tokens - 1)
            print(f"B={B:<4} {'sampler':<10} {per*1e6:9.1f} us/token", flush=True)


if __name__ == "__main__":
    main()
