from vqa_project_tpu.ops.pallas.edge_aggregate import (
    fused_edge_aggregate,
    edge_aggregate_reference,
)

__all__ = ["fused_edge_aggregate", "edge_aggregate_reference"]
