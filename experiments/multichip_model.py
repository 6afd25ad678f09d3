"""Hardware-free multi-chip throughput model (VERDICT r3 next #7).

No multi-chip hardware exists in this environment (one tunneled v5e chip),
so this script produces FALSIFIABLE predictions for when it does:

1. **ICI byte accounting from the jaxpr.**  For each mesh leg the repo
   ships (dp, dp x sp, dp x sp x tp, and the variant sp legs), trace the
   FULL sharded train step at the flagship shape (d512 x 6, seq 1024,
   kernel 128, 4096 tokens/microbatch) on the virtual CPU mesh and walk
   the jaxpr for collective primitives (all_to_all / psum / ppermute /
   all_gather / reduce_scatter), summing operand bytes.  This is the
   protocol-level traffic — what actually crosses ICI per optimizer step.

2. **A per-chip time model.**  t_step(n) = max(t_compute(n), t_ici(n)) +
   t_exposed, with
     * t_compute(n) = measured single-chip step time x (per-chip FLOP
       fraction) — dp divides tokens, sp divides time, tp divides the
       FFN/logits hidden dim; conv FLOPs under sp divide too (local
       full-length transforms run on C/sp channels);
     * t_ici(n) = ici_bytes(n) / (links x per-link BW), ring collective
       cost model: all_to_all moves S·(n-1)/n once, psum (all-reduce)
       2·S·(n-1)/n, ppermute S — all riding ICI;
     * v5e ICI assumption: 4 links/chip x 45 GB/s usable each direction
       (2D torus, 400 Gbps/link wire rate x ~90% achievable).  Stated
       explicitly so the prediction is falsifiable at the BW level too.

Output: a per-leg table (bytes/step by collective, predicted
tokens/sec/chip at n = 8/16/64) written to stdout; paste into
MULTICHIP_NOTES.md.

Run (CPU): XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           JAX_PLATFORMS=cpu python -m experiments.multichip_model
"""

from __future__ import annotations

import json
import os


# v5e assumptions (falsifiable): per-chip usable ICI bandwidth and the
# measured single-chip flagship step (BENCH_r03: 27.51 ms / 32768 tokens).
ICI_GBPS_PER_CHIP = 4 * 45.0  # 4 links x 45 GB/s usable
SINGLE_CHIP_MS_PER_32K_TOK = 20.52  # round-5 re-measured flagship step

# measured single-chip whole-step anchors per sequence length
# (experiments/profile_longseq, 32768 tok/step recipes, round-5 re-audit
# under the flat-accum default; the crossover model scales these by
# per-chip token fraction)
SEQ_ANCHOR_MS_PER_32K = {
    1024: 20.52,   # whole-block kernel (r5 audit, flat fold)
    2048: 38.11,   # tail/pallas (r5 audit)
    4096: 40.95,   # tail/pallas (r5 audit)
    8192: 90.09,   # tail/pallas (r5 audit)
    16384: 105.44,  # tail/matmul (r3 BENCHMARKS.md:855 — not re-audited)
}


def collect_collectives(jaxpr, acc=None):
    """Walk a (closed) jaxpr recursively, summing operand bytes per
    collective primitive."""
    acc = acc if acc is not None else {}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("all_to_all", "psum", "psum2", "all_gather",
                    "reduce_scatter", "ppermute", "all_reduce",
                    "psum_invariant"):
            nbytes = sum(
                v.aval.size * v.aval.dtype.itemsize
                for v in eqn.invars
                if hasattr(v, "aval") and hasattr(v.aval, "size")
            )
            acc[name] = acc.get(name, 0) + nbytes
        for sub in eqn.params.values():
            for s in (sub if isinstance(sub, (list, tuple)) else [sub]):
                if hasattr(s, "jaxpr"):   # ClosedJaxpr
                    collect_collectives(s.jaxpr, acc)
                elif hasattr(s, "eqns"):  # raw Jaxpr (e.g. shard_map's)
                    collect_collectives(s, acc)
    return acc


_HLO_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1,
                    "u8": 1, "pred": 1, "c64": 8, "c128": 16}


def collect_hlo_collectives(compiled_text: str) -> dict:
    """Sum output bytes per collective op in a compiled (post-GSPMD,
    post-SPMD-partitioning) HLO module.

    The jaxpr walk misses collectives GSPMD INSERTS during partitioning
    (e.g. the grad all-reduces of a pjit-sharded flax step) — exactly the
    rows MULTICHIP_NOTES flagged as lower bounds (VERDICT r4 next #7).
    The optimized HLO is ground truth: every cross-chip transfer appears
    as an all-reduce / all-to-all / collective-permute / all-gather /
    reduce-scatter instruction.  Bytes counted from the op's OUTPUT
    shape(s) (for all-reduce output == input payload)."""
    import re

    acc = {}
    # shapes before the op name:  %x = f32[4,1024]{1,0} all-reduce(...)
    # or tuples:  %x = (f32[16]{0}, f32[16]{0}) all-reduce(...)
    pat = re.compile(
        r"=\s*(\([^)]*\)|\S+)\s+"
        r"(all-reduce|all-to-all|collective-permute|all-gather|"
        r"reduce-scatter)\(")
    shape_pat = re.compile(r"(f64|f32|bf16|f16|s64|s32|u32|s16|u16|s8|u8|"
                           r"pred|c64|c128)\[([0-9,]*)\]")
    for m in pat.finditer(compiled_text):
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            size = 1
            for d in dims.split(","):
                if d:
                    size *= int(d)
            nbytes += size * _HLO_DTYPE_BYTES[dt]
        acc[op] = acc.get(op, 0) + nbytes
    return acc


_HLO_TO_RING = {"all-reduce": "psum", "all-to-all": "all_to_all",
                "collective-permute": "ppermute", "all-gather": "all_gather",
                "reduce-scatter": "reduce_scatter"}


def ici_seconds(coll_bytes: dict, n: int) -> float:
    """Ring-collective time for one step's collectives on an n-chip mesh.

    all_to_all: S·(n-1)/n crosses links once; psum: 2·S·(n-1)/n
    (reduce-scatter + all-gather); ppermute: S.  Per-chip injection BW is
    the binding resource (each chip owns ICI_GBPS_PER_CHIP)."""
    f = (n - 1) / n
    secs = 0.0
    for name, s in coll_bytes.items():
        if name == "all_to_all":
            secs += s * f
        elif name in ("psum", "psum2", "all_reduce"):
            secs += 2 * s * f
        elif name in ("all_gather", "reduce_scatter"):
            secs += s * f
        else:  # ppermute
            secs += s
    return secs / (ICI_GBPS_PER_CHIP * 1e9)


def main():
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.models.backbone import FixedSpectralLM
    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.parallel.mesh import make_mesh, shard_params
    from spectral_tpu.parallel.sharded_train import make_sharded_train_step
    from spectral_tpu.train.trainer import make_optimizer

    # flagship shape; accum 1 (collective volume per MICRO-step; the accum
    # loop multiplies compute and grad-psum equally, so per-token ratios
    # hold); batch_size = one flagship microbatch (4) x dp so every leg
    # carries the same per-chip tokens
    legs = [
        ("fused dp=8", dict(dp=8, sp=1, tp=1), dict(use_fused_block=True)),
        ("fused dp=4 x sp=2", dict(dp=4, sp=2, tp=1), dict(use_fused_block=True)),
        ("fused dp=2 x sp=2 x tp=2", dict(dp=2, sp=2, tp=2), dict(use_fused_block=True)),
        ("flax dp=2 x sp=4", dict(dp=2, sp=4, tp=1), {}),
        ("bicameral dp=4 x sp=2", dict(dp=4, sp=2, tp=1), dict(bicameral=True)),
        ("freq-native dp=4 x sp=2", dict(dp=4, sp=2, tp=1), dict(frequency_native=True)),
    ]

    results = {}
    for name, axes, extra in legs:
        n = axes["dp"] * axes["sp"] * axes["tp"]
        cfg = TrainConfig(
            d_model=512, n_layers=6, seq_len=1024, kernel_len=128,
            jpeg_transition=32, batch_size=4 * axes["dp"], accum_steps=1,
            dropout=0.0, compute_dtype="bfloat16", **extra,
        )
        mesh = make_mesh(**axes)
        model = FixedSpectralLM(cfg, mesh=mesh if (axes["sp"] > 1 or extra) else None)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        with mesh:
            params = model.init(jax.random.PRNGKey(0), x0)["params"]
            tx = make_optimizer(cfg)
            p = shard_params(params, mesh)
            opt = tx.init(p)
            build = make_sharded_train_step(model, cfg, tx, mesh)
            step, opt = build(p, opt)
            bx = jnp.zeros((1, cfg.batch_size, cfg.seq_len), jnp.int32)
            closed = jax.make_jaxpr(
                lambda p_, o_, bx_, by_: step(
                    p_, o_, bx_, by_, jnp.int32(512), jnp.float32(2e-4),
                    jax.random.PRNGKey(1)))(p, opt, bx, bx)
        coll = collect_collectives(closed.jaxpr)
        # post-GSPMD ground truth (VERDICT r4 next #7): compile the step
        # for the virtual mesh and account collectives from the OPTIMIZED
        # HLO — this includes the pjit-inserted grad all-reduces that the
        # jaxpr walk cannot see on the flax / frequency-native legs.
        with mesh:
            hlo_txt = step.lower(
                p, opt, bx, bx, jnp.int32(512), jnp.float32(2e-4),
                jax.random.PRNGKey(1)).compile().as_text()
        hcoll = collect_hlo_collectives(hlo_txt)
        coll_ring = {_HLO_TO_RING[k]: v for k, v in hcoll.items()}
        tokens = cfg.batch_size * cfg.seq_len  # global tokens per step

        # per-chip compute fraction: dp divides tokens; sp divides the
        # time axis (conv transforms divide over channels — same factor);
        # tp divides FFN hidden + logits (~55% of flagship FLOPs at
        # d512x6 — profile_train_step attribution), rest replicated
        tp = axes["tp"]
        tp_frac = 0.55 / tp + 0.45 if tp > 1 else 1.0
        per_chip_tokens = 4 * 1024  # one flagship microbatch per dp rank
        t_comp = (SINGLE_CHIP_MS_PER_32K_TOK / 1e3) * (
            per_chip_tokens / 32768) * tp_frac / (axes["sp"])
        # the compiled-HLO accounting is authoritative (complete for every
        # leg); keep the jaxpr numbers as the protocol-level cross-check
        t_ici = ici_seconds(coll_ring, n)
        t_ici_jaxpr = ici_seconds(coll, n)
        t_step = max(t_comp, t_ici) + 0.2 * min(t_comp, t_ici)  # 80% overlap
        results[name] = {
            "mesh": axes,
            "collective_bytes_per_step_jaxpr": {k: int(v) for k, v in coll.items()},
            "collective_bytes_per_step_hlo": {k: int(v) for k, v in hcoll.items()},
            "ici_ms": round(t_ici * 1e3, 3),
            "ici_ms_jaxpr_only": round(t_ici_jaxpr * 1e3, 3),
            "compute_ms_per_chip": round(t_comp * 1e3, 3),
            "predicted_ms_per_step": round(t_step * 1e3, 3),
            "predicted_tokens_per_sec_per_chip": int(tokens / t_step / n),
        }
        print(f"{name}: hlo={ {k: f'{v/1e6:.1f}MB' for k, v in hcoll.items()} } "
              f"jaxpr={ {k: f'{v/1e6:.1f}MB' for k, v in coll.items()} } "
              f"ici={t_ici*1e3:.2f}ms comp={t_comp*1e3:.2f}ms -> "
              f"{tokens / t_step / n / 1e3:.0f}K tok/s/chip", flush=True)

    # ---- sp-crossover prediction (VERDICT r4 next #7): at fixed 8 chips
    # and fixed per-chip batch, at what sequence length does dp=4 x sp=2
    # overtake dp=8?  Mechanism: dp=8 keeps the FULL [B_local, n_fft]
    # conv working set per chip (its per-chip compute anchor grows with
    # the measured per-seq step times), while sp=2 halves the time axis
    # per chip at the cost of the Ulysses all-to-all (linear in tokens).
    # The fused legs' collectives are all explicit shard_map primitives,
    # so jaxpr-level accounting is COMPLETE here (cross-checked against
    # HLO at seq 1024 above).
    crossover = {}
    for T in sorted(SEQ_ANCHOR_MS_PER_32K):
        anchor = SEQ_ANCHOR_MS_PER_32K[T]
        row = {}
        for lname, axes in (("dp=8", dict(dp=8, sp=1, tp=1)),
                            ("dp=4 x sp=2", dict(dp=4, sp=2, tp=1))):
            n = 8
            cfg = TrainConfig(
                d_model=512, n_layers=6, seq_len=T, kernel_len=128,
                jpeg_transition=32, batch_size=4 * axes["dp"], accum_steps=1,
                dropout=0.0, compute_dtype="bfloat16", use_fused_block=True,
            )
            mesh = make_mesh(**axes)
            model = FixedSpectralLM(cfg, mesh=mesh if axes["sp"] > 1 else None)
            x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
            with mesh:
                params = model.init(jax.random.PRNGKey(0), x0)["params"]
                tx = make_optimizer(cfg)
                p = shard_params(params, mesh)
                opt = tx.init(p)
                build = make_sharded_train_step(model, cfg, tx, mesh)
                step, opt = build(p, opt)
                bx = jnp.zeros((1, cfg.batch_size, cfg.seq_len), jnp.int32)
                closed = jax.make_jaxpr(
                    lambda p_, o_, bx_, by_: step(
                        p_, o_, bx_, by_, jnp.int32(T // 2),
                        jnp.float32(2e-4), jax.random.PRNGKey(1)))(
                            p, opt, bx, bx)
            coll = collect_collectives(closed.jaxpr)
            per_chip_tok = 4 * T
            t_comp = (anchor / 1e3) * (per_chip_tok / 32768) / axes["sp"]
            t_ici = ici_seconds(coll, n)
            t_step = max(t_comp, t_ici) + 0.2 * min(t_comp, t_ici)
            row[lname] = int(cfg.batch_size * T / t_step / n)
        row["sp_wins"] = row["dp=4 x sp=2"] > row["dp=8"]
        crossover[T] = row
        print(f"crossover seq={T}: dp8 {row['dp=8']/1e3:.0f}K vs "
              f"dp4xsp2 {row['dp=4 x sp=2']/1e3:.0f}K tok/s/chip "
              f"{'<- sp wins' if row['sp_wins'] else ''}", flush=True)

    print(json.dumps({
        "assumptions": {
            "ici_gbps_per_chip": ICI_GBPS_PER_CHIP,
            "single_chip_ms_per_32k_tok": SINGLE_CHIP_MS_PER_32K_TOK,
            "seq_anchor_ms_per_32k_tok": SEQ_ANCHOR_MS_PER_32K,
            "overlap": "80% of the smaller of (compute, ici) hidden",
        },
        "legs": results,
        "sp_crossover_8chips": crossover,
    }, indent=2))


if __name__ == "__main__":
    main()
