"""Configuration for the TPU-native VQA framework.

One dataclass replaces the three per-script argparse blocks of the
reference (run.py:492-533, run_imageclef.py:245-285, run_mimic.py) while
preserving every public flag name and default.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class ModelConfig:
    """Hyper-parameters of the conditioned-graph VQA model.

    Defaults mirror the reference VQA v2 path
    (/root/reference/run.py:503-531, sparse_graph_model.py:28-89).
    """

    vocab_size: int = 0            # set from dataset (q_words)
    emb_dim: int = 300             # --emb
    feat_dim: int = 2052           # 2048 RCNN + 4 bbox
    hid_dim: int = 1024            # --hid
    out_dim: int = 3001            # n_answers (top-3000 vocab + 1)
    combined_dim: int = 512        # graph-learner joint embedding
    n_kernels: int = 8             # --n_kernels
    neighbourhood_size: int = 16   # --neighbourhood_size
    n_obj: int = 36                # --n_obj (K region features per image)
    dropout: float = 0.5           # --dropout
    max_qlen: int = 16             # fixed question length after padding
                                   # (reference seqlen is 14/15; tokens past
                                   # qlen never reach the GRU output)
    # Numerics policy: params + reductions fp32, matmul compute bf16.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Fused Pallas graph-aggregate kernel (ops/pallas/edge_aggregate.py).
    # "auto" (default): on for TPU backends, off elsewhere (interpret
    # mode is correct but slow). Numerically identical to the XLA path
    # (oracle-tested both ways); measured it wins or ties end-to-end
    # (27.3k vs 26.4k qa/s in the same window at bs 256). Cold Mosaic
    # compiles are amortized by the persistent compilation cache.
    # resolve_use_pallas() turns "auto" into a bool (build_model does
    # this; GraphVQAModel also guards, for direct constructions).
    # True/False force.
    use_pallas: object = "auto"  # "auto" | True | False
    # serving-only int8 projections (ops/quant.py): build the model
    # with this on and apply it to quantize_params_for_serving(params).
    # ~2x MXU rate on the two conv-projection GEMMs; train=True asserts.
    quantized_inference: bool = False


def resolve_use_pallas(flag) -> bool:
    """"auto" -> True on TPU backends, False elsewhere; bools pass."""
    if isinstance(flag, bool):
        return flag
    import jax

    return jax.default_backend() == "tpu"


@dataclasses.dataclass
class TrainConfig:
    """Training-harness settings (reference run.py defaults)."""

    lr: float = 1e-4               # --lr
    epochs: int = 40               # --ep
    batch_size: int = 64           # --bsize (reference default is 1; 64 is
                                   # the documented train setting and the
                                   # TPU-sane default)
    lr_milestones: Tuple[int, ...] = (30,)   # MultiStepLR milestones
    lr_gamma: float = 0.5
    seed: int = 1000               # torch.manual_seed(1000) parity
    log_interval: int = 40         # 40-step loss averaging
    eval_interval: int = 400       # mid-epoch ckpt + mini-val cadence
    data_dir: str = "./data"
    save_dir: str = "./save"
    plot_dir: str = "./figures"
    name: str = "model"
    model_path: Optional[str] = None
    # TPU execution
    data_axis: str = "data"        # mesh axis name for data parallelism
    num_devices: Optional[int] = None  # None = all visible
    # model-parallel factor: tp>1 builds a 2-D (data, model) mesh and
    # shards parameters + Adam moments by the rules in parallel/tp.py
    # (classifier columns, GRU gate rows, MoNet kernel axis, vocab-
    # sharded embedding). Default 1 = pure DP, the right choice at this
    # model size; tp exists for large-vocab / many-kernel regimes.
    tp: int = 1
    # (state donation is unconditional in train/steps.py — on the
    # tunneled backend a non-donated step leaks the full state per call)
    prefetch: int = 2              # host->device prefetch depth
    # device-resident feature cache: used when the packed feature table
    # fits under this budget; otherwise batches stream dense features
    # from host. The cache removes ~40 MB/batch of H2D traffic.
    device_cache_bytes: int = 8 << 30
    # dtype of the cached feature table. "auto" follows the model's
    # compute dtype: with bf16 compute the model casts features to bf16
    # anyway (boxes are stored separately in f32, so pseudo-coords are
    # unaffected), and a bf16 table halves HBM residency AND the
    # per-step gather traffic — mathematically identical model inputs.
    # "int8": per-box-row symmetric quantization of the table
    # (ops/quant.py::quantize_feature_table; scale = absmax/127, max
    # element error ~0.4% of the row absmax). Dequantization happens on
    # device right after the row gather and fuses into the projection's
    # operand read. Quarters table residency vs f32 / halves vs bf16 —
    # the real 123k-image table (18.4 GB bf16) fits ONE v5e chip at
    # 9.2 GB int8 instead of needing the mesh-sharded cache. Opt-in:
    # it quantizes the model INPUTS (the other dtypes are exact).
    feature_cache_dtype: str = "auto"  # auto | float32 | bfloat16 | int8
    # Row-gather strategy for the device feature cache.
    # "auto" (default): on TPU, pack the table once into a tile-aligned
    #   view and serve each step's gather with the ring-buffered
    #   HBM->HBM DMA kernel (ops/pallas/gather_rows.py::gather_rows_dma)
    #   — measured 2.0x end-to-end at a 4.8 GB table (23.5k vs 11.7k
    #   qa/s f32; XLA's take lowering degrades with TABLE size, the DMA
    #   kernel costs only the data movement). Off-TPU, or when K*F
    #   doesn't tile-align, falls back to jnp.take.
    # True: force the Pallas path even where the packed layout isn't
    #   available (uses the per-row blocked kernel — slower than take,
    #   kept for interpret-mode testing).
    # False: always jnp.take.
    pallas_gather: object = "auto"  # "auto" | True | False
    # dtype of Adam's FIRST moment (optax mu_dtype). The moments are
    # pure HBM traffic every step (read+write of each); storing mu in
    # bfloat16 halves its share (~120 MB/step at real dims). The second
    # moment stays f32 (rsqrt of tiny averages is precision-sensitive;
    # mu only biases the update direction and bf16 momentum is standard
    # large-scale practice). float32 default = exact torch-Adam parity
    # (run.py:172); torch-checkpoint import casts exp_avg to this dtype.
    adam_mu_dtype: str = "float32"  # float32 | bfloat16
    # dtype of Adam's SECOND moment (storage only). The update math
    # still runs in f32 — the stored nu is upcast before optax's exact
    # scale_by_adam step and the fresh nu rounded back down after
    # (train/state.py::_with_nu_dtype) — so the only deviation from
    # torch Adam is one bf16 rounding of nu per step (~0.4% relative,
    # ~0.2% on the rsqrt denominator). Halves nu's HBM read+write.
    # float32 default = exact parity; bfloat16 is the opt-in trade the
    # round-3 profile names (moment traffic is pure HBM bandwidth).
    adam_nu_dtype: str = "float32"  # float32 | bfloat16
    # dtype of the data-parallel gradient all-reduce. float32 (default)
    # = the inferred-sharding jit path, bit-identical across device
    # counts. bfloat16 = explicit shard_map psum of bf16 gradients
    # (train/steps.py::_build_bf16_reduce_step): halves the per-step
    # ICI bytes (112.8 -> 56.4 MB at real dims per scaling_report) at
    # the cost of rounding each shard's contribution to bf16. Standard
    # large-scale practice; opt-in because defaults keep exactness.
    # Requires tp=1 and a replicated (or host-mode) feature cache.
    grad_reduce_dtype: str = "float32"  # float32 | bfloat16


@dataclasses.dataclass
class DataConfig:
    """Dataset-adapter settings."""

    data_dir: str = "./data"
    dataset: str = "vqa2"          # vqa2 | imageclef | mimic | synthetic
    emb_dim: int = 300
    n_obj: int = 36
    max_qlen: int = 16
    n_answers: int = 3000          # answer vocab size before +1


# Presets mirroring each reference harness' argparse defaults.
VQA2_PRESET = dict(lr=1e-4, epochs=40, dropout=0.5, n_obj=36,
                   neighbourhood_size=16, n_kernels=8, hid_dim=1024)
# run_imageclef.py:257-283 / run_mimic.py (medical defaults)
MEDICAL_PRESET = dict(lr=1e-3, epochs=40, dropout=0.4, n_obj=51,
                      neighbourhood_size=19, n_kernels=8, hid_dim=1024,
                      batch_size=8)
