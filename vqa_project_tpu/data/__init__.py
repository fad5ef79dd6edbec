"""TPU ingest: feature stores, vocab, GloVe cache, batching, prefetch."""

from vqa_project_tpu.data.zarr_store import ZarrGroup, ZarrWriter, open_group
from vqa_project_tpu.data.vocab import load_vocab, save_vocab
from vqa_project_tpu.data.glove import load_glove_embeddings
from vqa_project_tpu.data.datasets import GraphVQADataset
from vqa_project_tpu.data.loader import Batcher, prefetch_to_device

__all__ = [
    "ZarrGroup",
    "ZarrWriter",
    "open_group",
    "load_vocab",
    "save_vocab",
    "load_glove_embeddings",
    "GraphVQADataset",
    "Batcher",
    "prefetch_to_device",
]
