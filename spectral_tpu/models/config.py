"""Training/model configuration.

One frozen dataclass mirroring the reference's ~60-field ``TrainConfig``
(reference: fft_lm/train_fixed_full.py:34-105), with the same three config
layers: dataclass defaults → CLI overrides → checkpoint-saved dict rehydrated
on load (SURVEY.md §5.6).  Unlike the reference it is immutable (hashable, so
it can ride through jit as a static argument) and adds TPU-specific knobs
(compute dtype, mesh axes).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from spectral_tpu.ops.fftc import conv_freq_bins, conv_n_fft


@dataclass(frozen=True)
class TrainConfig:
    # data
    data_path: str = "tinystories_train.txt"
    # model
    vocab_size: int = 256
    d_model: int = 512
    n_layers: int = 6
    seq_len: int = 1024  # context length
    kernel_len: int = 128  # causal conv kernel length (per block)
    ffn_mult: int = 2  # feedforward expansion factor
    dropout: float = 0.1
    # FREQUENCY-NATIVE MODE (phase activations instead of time-domain FFN)
    frequency_native: bool = False
    use_fp32: bool = True  # fp32 for complex arithmetic (reference forces this)
    # BICAMERAL MODE (dual-path: frequency global + time local)
    bicameral: bool = False
    # training
    batch_size: int = 8
    accum_steps: int = 1
    # Fold the accum axis into the batch when the optimizer step fits on
    # chip WITHOUT gradient accumulation (round-4 attribution: the accum
    # scan's per-micro grad-tree materialize+add costs 7.5 ms of the
    # flagship 27.6 ms step; the flat batch runs the same 32768 tokens in
    # 20.2 ms).  Accumulation is a small-GPU workaround (reference
    # train_fixed_full.py:34-105 targets a 6 GB card) — on a 16 GB v5e
    # the flagship step simply fits.  "auto": flatten when
    # accum*batch*seq <= flatten_accum_max_tokens (chip-validated
    # region); "never"/"always" force.  Gradients are identical
    # (mean over the same tokens) — gated by test_trainer.py.
    flatten_accum: str = "auto"
    flatten_accum_max_tokens: int = 65536
    epochs: int = 200
    steps_per_epoch: int = 250
    lr: float = 2e-4
    weight_decay: float = 5e-4
    grad_clip: float = 1.0
    # Causality fix (deliberate divergence from the reference): project the
    # fused spectral filter onto its first n_fft - seq_len time taps so the
    # conv stays truly causal for trained gate/mask values — the reference's
    # circular tail leaks future tokens (ops/fftc.causal_filter_taps).
    # False reproduces the reference equations exactly.
    causal_taps: bool = True
    # progressive frequency schedule (JPEG)
    jpeg_low: int = 128
    jpeg_mid: int = 512
    jpeg_high: int = 1024
    jpeg_transition: int = 32  # soft roll-off bins (Gibbs ringing)
    # Third curriculum stage for long sequences (deliberate extension of
    # the reference's fixed 2-stage ladder, train_fixed_full.py:279-292,
    # which was designed for seq<=1024 where 512 bins ~= Nyquist): from
    # this epoch the fixed curriculum unlocks the FULL band.  At seq 4096
    # the 2-stage ladder otherwise caps at 512/4097 bins forever — the
    # reference's plateau rules unlock to Nyquist but its epoch-indexed
    # curriculum never did.  None (default) keeps reference parity.
    full_band_epoch: int | None = None
    # generation
    temperature: float = 0.8
    top_p: float = 0.9
    top_k: int = 0  # optional backstop; 0 disables
    repetition_penalty: float = 1.25
    repetition_window: int = 256
    max_run_length: int = 6  # hard anti-stutter
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    ban_cr: bool = True
    ascii_only: bool = True
    max_new: int = 400
    # misc
    seed: int = 1337
    # bf16 activations on the matmul paths; complex stays fp32 regardless
    compute_dtype: str = "float32"
    # fused Pallas FFT->filter->IFFT kernel for the standard block's conv
    use_pallas_kernel: bool = False
    # FFT backend for the standard block's conv: "xla" (jnp.fft) or
    # "matmul" (MXU four-step FFT, ops/matfft.py — XLA's VPU FFT measured
    # ~5% of HBM roofline on v5e, see BENCHMARKS.md)
    fft_backend: str = "xla"
    # matmul-FFT stage precision: "highest" (fp32-accurate, 3-pass bf16) or
    # "default" (bf16 inputs, ~1.5x faster, ~2e-3 relative transform error)
    fft_precision: str = "highest"
    # rematerialize block activations in backward (memory for FLOPs — the
    # long-context lever; jax.checkpoint per block)
    remat: bool = False
    # run each block as ONE VMEM-resident Pallas program (LN -> Toeplitz
    # conv -> gates -> residual -> FFN fused; ops/pallas_block.py) in the
    # training step — removes the ~15 per-block activation HBM round trips.
    # Dropout moves to the in-kernel TPU PRNG (statistically equivalent,
    # not bit-identical to the flax path).  Training-path only; eval and
    # decode go through the canonical flax module.
    use_fused_block: bool = False
    # conv backend for the long-sequence fused ("tail") route:
    # "auto" (shape-based dispatch in models/fused_apply.py), "direct"
    # (Toeplitz matmul — full MXU, O(T^2 B C) but tiny constants), or
    # "matmul" (four-step matmul-FFT, O(T log T) with large constants).
    tail_conv_backend: str = "auto"
    # override the fused-route dispatch ("" = fused_path_for's shape-based
    # choice; "block"|"tail" force that route) — benchmarks/tests only:
    # lets the whole-block-vs-tail crossover be A/B-measured through the
    # REAL train step (experiments/profile_longseq --force-path)
    fused_force_path: str = ""
    # PRNG implementation for dropout keys: "rbg" uses the TPU's hardware
    # RNG and makes dropout ~free; "threefry2x32" (JAX's default) costs
    # ~0.58 ms/block/micro-batch at the flagship shape — 35% of the block's
    # fwd+bwd (experiments/profile_block.py, v5e).  Dropout needs no
    # counter-based-PRNG guarantees, so rbg is the training default.
    dropout_prng: str = "rbg"
    # checkpointing
    ckpt_path: str = "fixed_spectral_ckpt.msgpack"
    save_every_epochs: int = 5
    # evaluation / anti-parroting
    val_windows: int = 2048
    val_batches: int = 20
    eval_every_epochs: int = 1
    parroting_snip_len: int = 64
    parroting_stride: int = 16
    parroting_snips: int = 64
    log_every_steps: int = 50
    # Sawtooth LR schedule (cosine annealing with stage-aligned restarts)
    stage1_epochs: int = 1
    stage2_epochs: int = 3
    stage1_lr_mult: float = 1.0
    stage1_min_mult: float = 0.1
    stage2_lr_mult: float = 1.0
    stage2_min_mult: float = 0.1
    stage3_lr_mult: float = 1.0
    stage3_min_mult: float = 0.05
    # parallelism (no reference counterpart — TPU-native, SURVEY.md §2.10)
    mesh_dp: int = 1  # data-parallel mesh axis size
    mesh_tp: int = 1  # tensor/channel-parallel mesh axis size
    mesh_sp: int = 1  # sequence-parallel mesh axis size

    # ------------------------------------------------------------------
    @property
    def n_fft(self) -> int:
        """Static FFT length of the causal conv at full seq_len."""
        return conv_n_fft(self.seq_len, self.kernel_len)

    @property
    def freq_bins(self) -> int:
        """rFFT bin count of the causal conv (cutoffs are in these units)."""
        return conv_freq_bins(self.seq_len, self.kernel_len)

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict, **overrides) -> "TrainConfig":
        """Rehydrate from a checkpoint-saved dict, ignoring unknown keys
        (mirrors the reference's hasattr-filtered rehydration,
        eval_ckpt.py:50-54)."""
        known = {f.name for f in dataclasses.fields(cls)}
        kept = {k: v for k, v in d.items() if k in known}
        kept.update(overrides)
        return cls(**kept)
