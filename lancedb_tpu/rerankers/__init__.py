from .base import Reranker, normalize_scores
from .colbert import ColbertReranker
from .cross_encoder import AnswerdotaiRerankers, CrossEncoderReranker
from .linear_combination import LinearCombinationReranker
from .rest import (
    CohereReranker,
    JinaReranker,
    OpenaiReranker,
    VoyageaiReranker,
    WatsonxReranker,
)
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
