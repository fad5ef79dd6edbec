"""vqa_project_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the Originofamonia/vqa-project reference (PyTorch).

Re-implements "Learning Conditioned Graph Structures for Interpretable
Visual Question Answering" (Norcliffe-Brown et al., arXiv 1806.07243) as a
TPU-first stack:

- ``ops``      pure-functional compute ops (pseudo-coords, Gaussian kernel
               weights, top-k neighbourhood selection, dense-matmul graph
               convolution, masked GRU scan, weight-norm dense, losses) plus
               Pallas TPU kernels for the fused hot path.
- ``models``   the flax Model assembling the full forward pass
               (parity target: /root/reference/sparse_graph_model.py).
- ``data``     TPU ingest: minimal zarr-v2 reader, packed feature store,
               GloVe embedding cache, fixed-shape padded batching with
               device prefetch; VQA v2 / ImageCLEF / MIMIC / NIH adapters
               and offline preprocessors.
- ``train``    train/trainval/eval/test harnesses, optax Adam + MultiStep
               LR, checkpointing, EvalAI result.json emission
               (parity target: /root/reference/run.py).
- ``parallel`` device mesh construction, batch sharding, cross-chip
               reductions over ICI (net-new vs the single-GPU reference).
- ``viz``      learned-adjacency interpretability plots + predictions CSV
               (parity target: /root/reference/plot.py).
- ``cli``      run / run_imageclef / run_mimic front-ends preserving the
               reference's public flag surface.
"""

__version__ = "0.1.0"
