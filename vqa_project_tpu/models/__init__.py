from vqa_project_tpu.models.graph_vqa import GraphVQAModel, WeightNormDense

__all__ = ["GraphVQAModel", "WeightNormDense"]
