"""Device compute kernels (JAX/XLA/Pallas) — the TPU data plane."""

from .distance import (
    hamming_distance,
    normalize_metric,
    pairwise_distance,
    refine_distances,
    squared_norms,
)
from .kmeans import kmeans_assign, kmeans_fit
from .pq import (
    adc_lut,
    adc_scan_lut,
    default_num_sub_vectors,
    pq_encode,
    pq_reconstruct,
    pq_train,
)
from .topk import approx_topk_smallest, blocked_topk_scan, mask_and_topk, merge_topk, topk_smallest

__all__ = [
    "pairwise_distance",
    "refine_distances",
    "hamming_distance",
    "squared_norms",
    "normalize_metric",
    "kmeans_fit",
    "kmeans_assign",
    "pq_train",
    "pq_encode",
    "pq_reconstruct",
    "adc_lut",
    "adc_scan_lut",
    "default_num_sub_vectors",
    "topk_smallest",
    "approx_topk_smallest",
    "blocked_topk_scan",
    "mask_and_topk",
    "merge_topk",
]
