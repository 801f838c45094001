from .jax_feed import JaxBatchFeeder
from .permutation import (Permutation, PermutationBuilder, PermutationSplit,
                          Permutations, permutation_builder)
from .streaming import StreamingDataset

__all__ = [
    "JaxBatchFeeder",
    "Permutation",
    "PermutationSplit",
    "Permutations",
    "PermutationBuilder",
    "permutation_builder",
    "StreamingDataset",
]
