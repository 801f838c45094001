from .base import Reranker, normalize_scores
from .linear_combination import LinearCombinationReranker
from .rrf import RRFReranker

__all__ = ["Reranker", "RRFReranker", "LinearCombinationReranker", "normalize_scores"]
