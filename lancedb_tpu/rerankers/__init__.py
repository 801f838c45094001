from .base import Reranker, normalize_scores
from .cross_encoder import (
    AnswerdotaiRerankers,
    CohereReranker,
    ColbertReranker,
    CrossEncoderReranker,
    JinaReranker,
    OpenaiReranker,
    VoyageaiReranker,
    WatsonxReranker,
)
from .linear_combination import LinearCombinationReranker
from .mrr import MRRReranker
from .rrf import RRFReranker

__all__ = [
    "Reranker",
    "RRFReranker",
    "LinearCombinationReranker",
    "MRRReranker",
    "CrossEncoderReranker",
    "CohereReranker",
    "OpenaiReranker",
    "JinaReranker",
    "VoyageaiReranker",
    "WatsonxReranker",
    "ColbertReranker",
    "AnswerdotaiRerankers",
    "normalize_scores",
]
