"""Model / engine configuration.

TPU-native counterpart of the reference's ``TransformerConfig``
(``/root/reference/src/model_loaders/model_loader.h:47-70``).  Hyper-parameters
come from the checkpoint itself; engine knobs (quantization type, batch size)
come from the CLI, mirroring ``main.cpp:22-46``.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class QuantType(enum.Enum):
    """Quantization bit-widths (reference: quant_operators.h:17-24)."""

    NONE = 0
    INT16 = 1
    INT8 = 2
    INT4 = 3

    @property
    def factor(self) -> int:
        # reference: quant_operators.h:32-34 (QUANT16/8/4_FACTOR)
        return {QuantType.NONE: 0, QuantType.INT16: 5792,
                QuantType.INT8: 127, QuantType.INT4: 7}[self]

    @staticmethod
    def parse(name: str) -> "QuantType":
        return {
            "none": QuantType.NONE, "fp32": QuantType.NONE,
            "int16": QuantType.INT16, "q16": QuantType.INT16,
            "int8": QuantType.INT8, "q8": QuantType.INT8,
            "int4": QuantType.INT4, "q4": QuantType.INT4,
        }[name.lower()]


class ModelArchitecture(enum.Enum):
    NONE = 0
    LLAMA = 1


class ActivationType(enum.Enum):
    NONE = 0
    SILU = 1
    SWIGLU = 2


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static transformer hyper-parameters.

    Mirrors reference ``TransformerConfig`` (model_loader.h:47-70) field by
    field, with TPU additions (dtypes).  All fields are hashable so the config
    can be a static argument under ``jax.jit``.
    """

    dim: int
    hidden_dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    vocab_size: int
    max_seq_len: int

    arch: ModelArchitecture = ModelArchitecture.LLAMA
    act_type: ActivationType = ActivationType.SWIGLU
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5

    # YaRN / NTK context-extension knobs (reference rope_v2 carries this
    # scaffolding dormant with ext_factor=0, tf_operators.cpp:355-372;
    # live here).  rope_orig_ctx 0 = max_seq_len.
    rope_freq_scale: float = 1.0
    rope_ext_factor: float = 0.0
    rope_attn_factor: float = 1.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    rope_orig_ctx: int = 0

    quant_type: QuantType = QuantType.INT8
    group_size: int = 64  # reference default: tensor.h:49

    name: str = ""

    @property
    def head_size(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_dim(self) -> int:
        return self.head_size * self.n_kv_heads

    @property
    def q_per_kv(self) -> int:
        # reference requires n_heads % n_kv_heads == 0 (transformer.cpp:215-218)
        return self.n_heads // self.n_kv_heads

    def validate(self) -> None:
        if self.dim % self.n_heads != 0:
            raise ValueError(f"dim={self.dim} not divisible by n_heads={self.n_heads}")
        if self.n_heads % self.n_kv_heads != 0:
            raise ValueError(
                f"n_heads={self.n_heads} not divisible by n_kv_heads={self.n_kv_heads}")

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Runtime engine knobs (reference ``Arguments``, main.cpp:22-46)."""

    max_seq_len: Optional[int] = None   # clamp, like transformer.cpp:32
    max_batch_size: int = 1             # decode batch slots
    prefill_buckets: tuple = (32, 64, 128, 256, 512, 1024)
    # prefix caching (BatchedEngine): admissions whose prompt shares a
    # block-aligned prefix with a LIVE slot's prompt copy that slot's K/V
    # rows device-side and prefill only the tail — repeated system prompts
    # stop paying full prefill.  Copied rows are bit-identical to a fresh
    # prefill of the same tokens (causal K/V depends only on the prefix).
    prefix_cache: bool = False
    # chunked prefill (single-stream engine): prompts longer than this run
    # as fixed-size blocks through the mid-sequence path, so a long-context
    # model never compiles (or allocates activations for) a full-window
    # prefill program.  0 = off (bucketed whole-prompt prefill).
    prefill_chunk: int = 0
    kv_dtype: str = "float32"           # reference keeps fp32 KV (transformer.cpp:368)
    # bf16 activations/matmuls by default: weight int8 values (<=127) are
    # exact in bf16 and the MXU runs native-speed; parity tests pin float32.
    compute_dtype: str = "bfloat16"
    use_pallas: bool = True             # fused kernels on TPU; jnp fallback otherwise
    # position-bounded KV streaming in decode attention (ops/pallas/
    # flash_decode.py): skips HBM reads of cache blocks past each slot's
    # position.  False = always-stream kernels (ops/pallas/attention.py).
    flash_attention: bool = True
    # concat QKV + gate/up into single matmuls (single-mesh only; forced off
    # under a multi-device mesh where the concat axis would straddle TP
    # shard boundaries).  One 48/92 MB weight stream replaces 3x16/2x46 MB
    # ones: measured 96.4 vs 92.5 tok/s single-stream 7B INT8 on v5e.
    # Engines fall back to unfused if a projection mix can't fuse (e.g.
    # INT4 where only some projections pack).
    fuse_weights: bool = True
    parity_mode: bool = False           # bit-faithful reference math (act-quant int dot)
    donate_cache: bool = True
    # group-scale storage dtype for non-wide (int8/int4) weights:
    # "bfloat16" halves the HBM scale stream (f32 scales are 1/16 of the
    # int8 weight bytes at gs=64 — 416 MB of the 7B step's 7.15 GB) with
    # BIT-IDENTICAL decode math, because the dequant kernel casts scales to
    # bf16 before the multiply anyway (ops/pallas/qmm._qmm_chunk).
    # "auto" resolves per engine from the round-5 on-chip A/B: bfloat16 in
    # the single-stream Engine for INT8 on the Pallas path (99.3 vs 96.9
    # tok/s at 7B — the stream is the whole bill at B=1), float32 in the
    # batched/multihost engines (2839.6 vs 2721.0 at B=48/S=512: the scale
    # stream amortizes over B rows while the bf16->f32 upcast VPU work
    # does not).  parity_mode and the f32 jnp fallback always keep f32,
    # where storage rounding would show; INT16 always keeps f32; INT4
    # bf16-scale dequant measured SLOWER in round 2, so auto keeps f32.
    scale_dtype: str = "auto"
    # deferred staged-KV decode chunks (BatchedEngine): fresh K/V rows of a
    # whole K-step decode chunk accumulate in a small exact-tile staging
    # buffer and land in the big cache with ONE spec_write per chunk,
    # instead of one slab read-modify-write per slot per layer per step
    # (int8 sublane tiling makes a single-row cache write rewrite a 32-row
    # slab — measured ~1.5 ms/step of pure slab traffic at serving batch).
    # Attention composes cache + staged + fresh exactly as the sequential
    # path would see them (models/batched.decode_step_deferred); outputs
    # differ only in float rounding (softmax-merge order).  Needs the
    # flash-attention Pallas path; silently falls back per-chunk otherwise.
    deferred_kv: bool = False
    # QoS (batched/multi-host engines): while requests are QUEUED behind a
    # full batch, cap decode chunks at this many steps (power of two) so a
    # slot freed mid-chunk reaches the next admission point sooner —
    # bounds queued-request TTFT at the cost of more dispatches.  0 = off
    # (chunks stay decode_chunk long).  Per-request priority/deadline knobs
    # live on submit()/Request.
    qos_chunk: int = 0
    # GSPMD mesh spec, e.g. "model=8" or "data=2,model=4" (empty = single
    # device).  With a mesh, params/KV get TP shardings (parallel/sharding.py)
    # and the jnp compute path runs partitioned by XLA; the Pallas fast path
    # is single-device and is disabled under a multi-device mesh.
    mesh: str = ""
    # opt-in: on a multi-device mesh, run the engines' decode/prefill through
    # the explicit shard_map path (parallel/spmd_step.py) — each device
    # executes the fused Pallas kernels on its LOCAL weight/KV shards with
    # per-layer psums, instead of GSPMD auto-partitioning the jnp ops.
    spmd_kernels: bool = False
    # run the Pallas kernels in interpret mode (works on the CPU backend) —
    # lets engine-level tests exercise the exact kernel code paths on the
    # virtual-device mesh; never set on real TPU runs.
    pallas_interpret: bool = False


def resolve_scale_dtype(ec: EngineConfig, config: ModelConfig,
                        batched: bool, pallas_live: Optional[bool] = None
                        ) -> str:
    """Resolve ``EngineConfig.scale_dtype`` — in particular "auto" — to a
    concrete storage dtype for this engine (see the field comment for the
    measured A/B behind each branch).  ``batched`` = continuous-batching /
    multi-host serving (scale stream amortizes over B rows; f32 wins);
    single-stream decode is stream-bound and bf16 scales win for INT8 on
    the Pallas path.  ``pallas_live`` = whether the fused kernels actually
    run (backend-dependent); the jnp fallback dequantizes in f32, where
    bf16 storage rounding would change tokens, so auto keeps f32 there."""
    if ec.scale_dtype != "auto":
        return ec.scale_dtype
    if pallas_live is None:
        pallas_live = ec.use_pallas
    if (not batched and pallas_live and not ec.parity_mode
            and config.quant_type == QuantType.INT8):
        return "bfloat16"
    return "float32"
