"""The conditioned-graph VQA model, TPU-native.

Parity target: Model (/root/reference/sparse_graph_model.py:28-159) and its
layers (/root/reference/layers.py). Forward returns the same triple
(logits, adjacency_matrix, h_max_indices).

Differences by design (TPU-first, not a translation):
- packed-sequence GRU -> fixed-length masked lax.scan (ops/gru.py);
- gather-based top-m neighbourhood -> dense masked matmul
  (ops/neighbourhood.py, ops/graph_conv.py), optionally fused into a
  Pallas kernel (ops/pallas/);
- n_kernels separate nn.Linear convolutions -> one stacked contraction;
- bf16 matmul policy with fp32 parameters and fp32 epsilon-sensitive math
  (Gaussian weights, softmax, loss).

Parameter initializers replicate torch defaults so that seeds aside, the
two implementations start from the same distribution; exact torch
state_dicts can be imported via models/torch_import.py.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqa_project_tpu.config import ModelConfig
from vqa_project_tpu.ops import (
    bbox_centres,
    gaussian_kernel_weights,
    gru_encode,
    polar_pseudo_coords,
)
from vqa_project_tpu.ops.graph_conv import masked_graph_convolution
from vqa_project_tpu.ops.neighbourhood import masked_neighbourhood


def _torch_linear_init(fan_in: int):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _uniform_init(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init


class WeightNormDense(nn.Module):
    """Dense layer with torch-style weight normalization (dim=0).

    w = g * v / ||v||, with the norm taken per output unit over the input
    axis — the explicit form of nn.utils.weight_norm(nn.Linear(...)) used
    at /root/reference/layers.py:171-172 and sparse_graph_model.py:88-89.
    At init g = ||v|| so w == v, matching torch.
    """

    features: int
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype of the stored output: defaults to the compute dtype (half the
    # HBM traffic on the bandwidth-bound step); pass float32 for outputs
    # feeding precision-sensitive math (e.g. the final logits).
    out_dtype: Optional[jnp.dtype] = None
    # serving-only int8 weights (ops/quant.py): declares (v_q, v_scale)
    # instead of (v, g) — the weight-norm column scale g/||v|| is folded
    # into v_scale by quantize_params_for_serving. Row-slicing v_q for
    # the split shared= dot stays valid (quantization is per COLUMN).
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 shared: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Apply y = (concat([x, shared_broadcast]) @ (g*v/||v||)) + b.

        `shared` is an optional (B, D2) input logically broadcast over
        x's middle (node) axis — i.e. the layer behaves exactly as if
        concat([x, broadcast(shared)], -1) of width d1+D2 were passed,
        with v of shape (d1+D2, features). The dot is SPLIT instead:
        the shared half runs once per image ((B, D2) rows) rather than
        once per node ((B*K, D2) rows), and the (B, K, d1+D2) concat is
        never materialized — at the VQA dims that deletes a third of
        the edge_layer_1 FLOPs and a ~57 MB/step intermediate. The
        parameter layout (one fused v) is unchanged, so checkpoints
        and the torch importer are unaffected.
        """
        out_dtype = self.out_dtype or self.compute_dtype
        in_dim = x.shape[-1] + (shared.shape[-1] if shared is not None
                                else 0)
        if self.quantized:
            from vqa_project_tpu.ops.quant import int8_matmul

            q = self.param("v_q", nn.initializers.zeros_init(),
                           (in_dim, self.features), jnp.int8)
            v_scale = self.param("v_scale", nn.initializers.ones_init(),
                                 (self.features,), jnp.float32)
            d1 = x.shape[-1]
            y = int8_matmul(x.reshape(-1, d1), q[:d1], v_scale
                            ).reshape(*x.shape[:-1], self.features)
            if shared is not None:
                assert x.ndim == 3 and shared.ndim == 2, (
                    "shared= expects x (B, K, d1) and shared (B, d2)")
                y = y + int8_matmul(shared, q[d1:], v_scale)[:, None, :]
            y = y.astype(out_dtype)
            if self.use_bias:
                b = self.param("b", _torch_linear_init(in_dim),
                               (self.features,))
                y = y + b.astype(out_dtype)
            return y
        v = self.param("v", _torch_linear_init(in_dim), (in_dim, self.features))

        # g must equal ||v|| at init (torch weight_norm); the init fn
        # closes over v, which flax has already materialized.
        g = self.param(
            "g",
            lambda key, shape, dtype=jnp.float32: jnp.linalg.norm(
                v, axis=0
            ).astype(dtype),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.astype(jnp.float32), axis=0)
        scale = (g.astype(jnp.float32) / jnp.maximum(norm, 1e-12))
        # scale the OUTPUT columns instead of materializing g*v/||v||:
        # x @ (v*scale) == (x @ v) * scale exactly per column, but the
        # (in, out) scaled-weight tensor (36 MB at out_2) never exists —
        # the scale runs over the (B, out) activations instead, and the
        # backward's dv comes straight from the matmul VJP.
        d1 = x.shape[-1]
        y = jnp.dot(
            x.astype(self.compute_dtype),
            v[:d1].astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if shared is not None:
            assert x.ndim == 3 and shared.ndim == 2, (
                "shared= expects x (B, K, d1) and shared (B, d2)")
            ys = jnp.dot(
                shared.astype(self.compute_dtype),
                v[d1:].astype(self.compute_dtype),
                preferred_element_type=jnp.float32,
            )                                         # (B, features)
            y = y + ys[:, None, :]
        y = (y * scale[None, :]).astype(out_dtype)
        if self.use_bias:
            b = self.param("b", _torch_linear_init(in_dim), (self.features,))
            y = y + b.astype(out_dtype)
        return y


class GraphLearner(nn.Module):
    """Question-conditioned dense adjacency A = E E^T.

    Parity target: GraphLearner (/root/reference/layers.py:147-197): two
    weight-normed Linear+ReLU layers then a batched outer product.
    """

    combined_dim: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, graph_nodes: jnp.ndarray,
                 shared: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = WeightNormDense(self.combined_dim, compute_dtype=self.compute_dtype,
                            quantized=self.quantized,
                            name="edge_layer_1")(graph_nodes, shared=shared)
        h = nn.relu(h)
        h = WeightNormDense(self.combined_dim, compute_dtype=self.compute_dtype,
                            quantized=self.quantized,
                            name="edge_layer_2")(h)
        h = nn.relu(h)
        adj = jnp.einsum(
            "bkc,bjc->bkj",
            h.astype(self.compute_dtype),
            h.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return adj


class GaussianGraphConv(nn.Module):
    """MoNet Gaussian-kernel graph convolution over dense edge weights.

    Parity target: NeighbourhoodGraphConvolution
    (/root/reference/layers.py:24-144), reformulated as dense matmuls.
    With use_pallas=True the mask/softmax/Gaussian/aggregation block runs
    as one fused Pallas kernel (ops/pallas/edge_aggregate.py); the
    per-kernel feature projection (the big MXU matmul) stays in XLA in
    both paths.
    """

    in_dim: int
    out_dim: int
    n_kernels: int
    # NOTE: the neighbourhood size and alpha-vs-mask choice live in the
    # CALLER since the round-3 top-m hoist — they shape the `selection`
    # tensor passed in; module attrs for them would be dead knobs
    use_pallas: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    # serving-only int8 projection (ops/quant.py): the module then
    # declares (conv_kernels_q, conv_kernels_scale) instead of
    # conv_kernels and expects a tree from quantize_params_for_serving
    quantized: bool = False

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,          # (B, K, in_dim)
        adjacency: jnp.ndarray,         # (B, K, K) learned adjacency
        selection: jnp.ndarray,         # (B, K, K) alpha or 0/1 mask
        pseudo: jnp.ndarray,            # (B, K, K, 2) polar pseudo-coords
        *,
        fuse_relu: bool = False,        # Pallas path only: relu epilogue
        dropout_rate: float = 0.0,      # Pallas+TPU only: in-kernel
        seeds: jnp.ndarray = None,      #   inverted dropout, per-image
        params_only: bool = False,      # just declare+return the params
    ) -> jnp.ndarray:
        mean_rho = self.param("mean_rho", _uniform_init(0.0, 1.0),
                              (self.n_kernels,))
        mean_theta = self.param("mean_theta",
                                _uniform_init(-math.pi, math.pi),
                                (self.n_kernels,))
        precision_rho = self.param("precision_rho", _uniform_init(0.0, 1.0),
                                   (self.n_kernels,))
        precision_theta = self.param("precision_theta",
                                     _uniform_init(0.0, 1.0),
                                     (self.n_kernels,))
        # Stacked per-kernel projections (reference: n_kernels bias-free
        # Linears of shape (in, out/n), layers.py:54-55), stored FUSED as
        # one (in, out) matrix whose column block n*d:(n+1)*d is kernel
        # n: the projection, its dX and its dW then compile to plain 2-D
        # GEMMs instead of XLA's batch-8 convolution emitter, which
        # chose exotic layouts (two ~100 us copies at the Pallas
        # boundary) and ~40% MXU utilization on the weight gradient
        # (round-3 profile attack). Same iid init; torch_import concats
        # the reference's per-kernel Linears along columns.
        if self.quantized:
            assert not params_only, \
                "merged-block kernel does not support quantized weights"
            conv_q = self.param(
                "conv_kernels_q", nn.initializers.zeros_init(),
                (self.in_dim, self.out_dim), jnp.int8)
            conv_scale = self.param(
                "conv_kernels_scale", nn.initializers.ones_init(),
                (self.out_dim,), jnp.float32)
        else:
            conv_kernels = self.param(
                "conv_kernels",
                _torch_linear_init(self.in_dim),
                (self.in_dim, self.out_dim),
            )
        if params_only:
            # the merged whole-block kernel (ops/pallas/graph_block.py)
            # consumes both convs' parameters directly in (n, in, d)
            return (jnp.stack([mean_rho, mean_theta,
                               precision_rho, precision_theta]),
                    conv_kernels.reshape(
                        self.in_dim, self.n_kernels, -1).transpose(1, 0, 2))

        if self.use_pallas:
            import jax as _jax

            from vqa_project_tpu.ops.graph_conv import matmul_precision
            from vqa_project_tpu.ops.pallas.edge_aggregate import \
                fused_sel_aggregate_act

            b, k = features.shape[:2]
            # proj flows to the kernel in the COMPUTE dtype: the
            # in-kernel aggregation dots then match the XLA path's
            # precision exactly (bf16 fast path for bf16 compute;
            # f32 compute triggers the kernel's exact-f32 dots via
            # _dot_precision) and the (B, K, nd) HBM round trip halves.
            cdt = jnp.dtype(self.compute_dtype)
            if self.quantized:
                from vqa_project_tpu.ops.quant import int8_matmul

                proj = int8_matmul(
                    features.reshape(b * k, -1), conv_q, conv_scale
                ).astype(cdt).reshape(b, k, -1)
            else:
                proj = jnp.dot(
                    features.astype(cdt).reshape(b * k, -1),
                    conv_kernels.astype(cdt),
                    preferred_element_type=cdt,
                    precision=matmul_precision(self.compute_dtype)
                ).reshape(b, k, -1)
            gparams = jnp.stack([mean_rho, mean_theta,
                                 precision_rho, precision_theta])
            interpret = _jax.devices()[0].platform != "tpu"
            # selection (alpha or the 0/1 mask) is computed ONCE in XLA
            # by the caller and shared by both convs; the kernel's
            # backward emits d(sel) and XLA's autodiff carries the
            # softmax VJP to the adjacency (round-3 hoist of the
            # in-kernel O(K^3) rank selection)
            out = fused_sel_aggregate_act(
                selection.astype(jnp.float32), pseudo,
                proj.reshape(b, k, -1), gparams, seeds,
                fuse_relu, dropout_rate, interpret)
            return out

        gw = gaussian_kernel_weights(
            pseudo, mean_rho, mean_theta,
            precision_rho, precision_theta,
        )                                               # (B, K, K, n)
        edge_w = gw * selection[..., None]              # zero off-neighbourhood
        if self.quantized:
            from vqa_project_tpu.ops.quant import int8_matmul

            b, k = features.shape[:2]
            proj = int8_matmul(features.reshape(b * k, -1),
                               conv_q, conv_scale)
            proj = proj.astype(jnp.dtype(self.compute_dtype)).reshape(
                b, k, self.n_kernels, -1)
            return masked_graph_convolution(
                features, edge_w, None,
                compute_dtype=self.compute_dtype, proj=proj)
        return masked_graph_convolution(
            features, edge_w, conv_kernels, compute_dtype=self.compute_dtype
        )


class GraphVQAModel(nn.Module):
    """Full conditioned-graph VQA forward pass.

    __call__(question, image, qlen) -> (logits, adjacency, h_max_indices),
    the same outputs as the reference Model.forward
    (/root/reference/sparse_graph_model.py:91-159). K is static (n_obj) —
    the reference's per-batch K sync (sparse_graph_model.py:103) is a
    host round-trip that XLA cannot compile; shapes here are fixed.
    """

    cfg: ModelConfig
    pretrained_wemb: Optional[np.ndarray] = None

    @nn.compact
    def __call__(
        self,
        question: jnp.ndarray,   # (B, T) int32
        image,                   # (B, K, feat_dim) OR (features, boxes)
        qlen: jnp.ndarray,       # (B,) int32
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        cdt = jnp.dtype(cfg.compute_dtype)
        # resolve "auto" for direct constructions that bypass
        # train.loop.build_model (tests, __graft_entry__)
        from vqa_project_tpu.config import resolve_use_pallas
        use_pallas = resolve_use_pallas(cfg.use_pallas)

        # image arrives either pre-concatenated (B, K, feat+4) or as a
        # (features, boxes) pair. The pair form lets the device cache
        # keep features in the compute dtype with NO f32 round trip
        # (halving gather+concat HBM traffic) while boxes stay f32 for
        # the pseudo-coordinates — bitwise the same inputs either way,
        # since the concatenated path bf16-casts everything below too.
        if isinstance(image, (tuple, list)):
            feats, boxes = image
            bb_centre = bbox_centres(boxes)  # [..., -4:] of (B,K,4) = boxes
            image = jnp.concatenate(
                [feats.astype(cdt), boxes.astype(cdt)], axis=-1)
        else:
            # bbox centres from the raw tensor (fp32, before any downcast)
            bb_centre = bbox_centres(image)
        pseudo = polar_pseudo_coords(bb_centre)          # (B, K, K, 2)

        # the (B, K, 2052) feature tensor and everything built from it
        # flow in the compute dtype: the train step is HBM-bound and
        # these are the largest activations
        image = image.astype(cdt)

        # int8 serving (ops/quant.py): edge layers, conv projections and
        # the classifier run int8 GEMMs; serving-only (no int8 backward)
        quantized = bool(getattr(cfg, "quantized_inference", False))
        assert not (quantized and train), \
            "quantized_inference is serving-only (no int8 backward)"

        # --- feature dropout (applied to the full feat||bbox vector,
        #     matching sparse_graph_model.py:111) ---
        # VQAX_DROPOUT_BITS=8|16|32 draws the Bernoulli mask from
        # narrow random bits instead of flax's u32 path: the
        # (B, K, 2052) u32 bits tensor is 75.6 MB/step of HBM traffic
        # at bs 256 (the select fusion measured 117 us); u8 bits cut
        # that 4x. The keep rate quantizes to 1/2^width (u8:
        # |err| <= 2^-9, e.g. 0.4 -> 102/256 = 0.3984) — the inverted
        # scale still uses the exact configured rate, so kept
        # activations are unchanged and only the mask frequency
        # carries the quantization. Default 8 (op profile: busy 6389
        # vs 6639 us; fast-mode end-to-end A/B +4.7% together with the
        # wembed layout pin); 32 restores the stock flax path.
        bits_env = os.environ.get("VQAX_DROPOUT_BITS", "8")
        if train and cfg.dropout > 0 and bits_env in ("8", "16"):
            from vqa_project_tpu.ops.dropout import narrow_bits_dropout

            image = narrow_bits_dropout(image, cfg.dropout,
                                        self.make_rng("dropout"),
                                        width=int(bits_env))
        else:
            image = nn.Dropout(rate=cfg.dropout,
                               deterministic=not train)(image)

        # --- question encoding ---
        wembed = self.param(
            "wembed",
            (lambda key, shape, dtype=jnp.float32:
             jnp.asarray(self.pretrained_wemb, dtype)
             if self.pretrained_wemb is not None
             else jax.random.normal(key, shape, dtype)),
            (cfg.vocab_size, cfg.emb_dim),
        )
        emb = jnp.take(wembed, question, axis=0)          # (B, T, E)
        h = cfg.hid_dim
        gru_bound = 1.0 / math.sqrt(h)
        w_ih = self.param("gru_w_ih", _uniform_init(-gru_bound, gru_bound),
                          (3 * h, cfg.emb_dim))
        w_hh = self.param("gru_w_hh", _uniform_init(-gru_bound, gru_bound),
                          (3 * h, h))
        b_ih = self.param("gru_b_ih", _uniform_init(-gru_bound, gru_bound),
                          (3 * h,))
        b_hh = self.param("gru_b_hh", _uniform_init(-gru_bound, gru_bound),
                          (3 * h,))
        # GRU matmuls follow the compute policy (hidden state itself stays
        # fp32; bf16 weights cost ~4e-3 abs error on the final hidden
        # state and ~30% of the scan time). With use_pallas the whole
        # recurrence runs as one VMEM-resident Pallas kernel.
        if use_pallas:
            import jax as _jax

            from vqa_project_tpu.ops.pallas import gru_encode_pallas

            qenc = gru_encode_pallas(
                emb, qlen, w_ih, w_hh, b_ih, b_hh, compute_dtype=cdt,
                interpret=_jax.devices()[0].platform != "tpu")
        else:
            qenc = gru_encode(emb, qlen, w_ih, w_hh, b_ih, b_hh,
                              compute_dtype=cdt)          # (B, H)

        # --- question-conditioned adjacency. The reference concatenates
        #     the broadcast question encoding onto every node
        #     (sparse_graph_model.py: cat -> GraphLearner); here the
        #     broadcast half of edge_layer_1's matmul runs once per
        #     image via the split-dot `shared=` path (exact same math,
        #     same fused v parameter) and the (B, K, F+H) concat —
        #     ~57 MB/step in bf16 at batch 256 — never exists.
        #     VQAX_SPLIT_SHARED=0 restores the concat formulation (A/B
        #     knob; both hit the same parameters). ---
        learner = GraphLearner(
            cfg.combined_dim, compute_dtype=cdt, quantized=quantized,
            name="adjacency_1")
        if os.environ.get("VQAX_SPLIT_SHARED", "1") == "0":
            k = image.shape[1]
            qenc_rep = jnp.broadcast_to(
                qenc.astype(cdt)[:, None, :], (qenc.shape[0], k, h))
            nodes = jnp.concatenate([image, qenc_rep], axis=-1)
            adjacency = learner(nodes)                   # (B, K, K)
        else:
            adjacency = learner(image, shared=qenc.astype(cdt))

        # --- shared neighbourhood selection (dense masked form); both
        #     paths compute it here ONCE — the fused Pallas kernels
        #     consume the selected weights directly (the in-kernel
        #     O(K^3) rank selection was hoisted out in round 3) ---
        alpha, mask = masked_neighbourhood(
            adjacency, cfg.neighbourhood_size)

        # --- graph convolution 1 (alpha-weighted neighbours); on the
        #     fused path the relu (+ inverted dropout on real TPU, via
        #     per-image PRNG seeds) runs as an in-kernel epilogue — the
        #     interpret backend lacks the TPU PRNG, so the virtual-mesh
        #     path keeps flax dropout outside the kernel ---
        import jax as _jax

        on_tpu = _jax.devices()[0].platform == "tpu"
        in_kernel_drop = (use_pallas and on_tpu and train
                          and cfg.dropout > 0)
        seeds = None
        if in_kernel_drop:
            seeds = jax.random.randint(
                self.make_rng("dropout"), (image.shape[0],),
                0, 2 ** 31 - 1, dtype=jnp.int32)
        conv1 = GaussianGraphConv(
            cfg.feat_dim, cfg.hid_dim * 2, cfg.n_kernels,
            use_pallas=use_pallas, quantized=quantized,
            compute_dtype=cdt, name="graph_convolution_1")
        conv2 = GaussianGraphConv(
            cfg.hid_dim * 2, cfg.hid_dim, cfg.n_kernels,
            use_pallas=use_pallas, quantized=quantized,
            compute_dtype=cdt, name="graph_convolution_2")

        if use_pallas and on_tpu and os.environ.get(
                "VQAX_MERGED_BLOCK", "0") == "1":
            # whole-block kernel: proj1 -> agg1(alpha) -> relu/dropout
            # -> proj2 -> agg2(mask) -> relu, ONE Pallas call per
            # direction (ops/pallas/graph_block.py). OFF by default:
            # measured SLOWER end-to-end at the VQA dims (25.1k vs
            # ~30k qa/s) — one core serializing the whole chain loses
            # to XLA overlapping its batched projections with the rest
            # of the step, even with tile-level (bt*K-row) in-kernel
            # matmuls. Kept exact (oracle-tested both directions) for
            # shapes where call-count dominates.
            from vqa_project_tpu.ops.pallas.graph_block import \
                fused_graph_block

            gp1, k1 = conv1(image, adjacency, alpha, pseudo,
                            params_only=True)
            gp2, k2 = conv2(image, adjacency, mask, pseudo,
                            params_only=True)
            hg2 = fused_graph_block(
                adjacency.astype(jnp.float32), pseudo,
                image.astype(cdt), k1, gp1, k2, gp2, seeds,
                cfg.neighbourhood_size,
                cfg.dropout if in_kernel_drop else 0.0, False)
        else:
            hg1 = conv1(image, adjacency, alpha, pseudo,
                        fuse_relu=use_pallas,
                        dropout_rate=cfg.dropout if in_kernel_drop
                        else 0.0,
                        seeds=seeds)
            if not use_pallas:
                hg1 = nn.relu(hg1)
            if not in_kernel_drop:
                hg1 = nn.Dropout(rate=cfg.dropout,
                                 deterministic=not train)(hg1)

            # --- graph convolution 2 (unweighted neighbours) ---
            hg2 = conv2(hg1, adjacency, mask, pseudo,
                        fuse_relu=use_pallas)
            if not use_pallas:
                hg2 = nn.relu(hg2)

        # --- max-pool over nodes, fuse with question ---
        h_max_indices = jnp.argmax(hg2, axis=1)          # (B, hid)
        pooled = jnp.max(hg2, axis=1)                    # (B, hid)
        fused = nn.relu(qenc) * pooled

        # --- weight-norm classifier ---
        h1 = WeightNormDense(cfg.out_dim, compute_dtype=cdt,
                             quantized=quantized, name="out_1")(fused)
        h1 = nn.relu(h1)
        h1 = nn.Dropout(rate=cfg.dropout, deterministic=not train)(h1)
        # logits stay fp32: they feed the softplus loss and argmax
        logits = WeightNormDense(cfg.out_dim, compute_dtype=cdt,
                                 out_dtype=jnp.float32,
                                 quantized=quantized, name="out_2")(h1)

        return logits, adjacency, h_max_indices
