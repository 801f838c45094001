from .jax_feed import JaxBatchFeeder
from .permutation import Permutation, PermutationBuilder, permutation_builder
from .streaming import StreamingDataset

__all__ = [
    "JaxBatchFeeder",
    "Permutation",
    "PermutationBuilder",
    "permutation_builder",
    "StreamingDataset",
]
