from vqa_project_tpu.ops.pallas.edge_aggregate import (
    fused_edge_aggregate,
    edge_aggregate_reference,
)

__all__ = ["fused_edge_aggregate", "edge_aggregate_reference"]

from vqa_project_tpu.ops.pallas.gru_scan import (  # noqa: E402
    gru_encode_pallas,
    pallas_gru,
)

__all__ += ["gru_encode_pallas", "pallas_gru"]
