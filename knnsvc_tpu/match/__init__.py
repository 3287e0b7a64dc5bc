from knnsvc_tpu.match.distance import cosine_distance
from knnsvc_tpu.match.knn import knn_topk
from knnsvc_tpu.match.f0_logic import (
    torch_median,
    masked_log_median,
    shift_f0_to_target_register,
    sort_by_f0_compatibility,
)
from knnsvc_tpu.match.concat_cost import knn_with_concat_cost

__all__ = [
    "cosine_distance",
    "knn_topk",
    "torch_median",
    "masked_log_median",
    "shift_f0_to_target_register",
    "sort_by_f0_compatibility",
    "knn_with_concat_cost",
]
