from .jax_feed import JaxBatchFeeder
from .permutation import (Permutation, PermutationBuilder, PermutationReader,
                          PermutationSplit, Permutations, Transforms,
                          permutation_builder)
from .streaming import StreamingDataset

__all__ = [
    "JaxBatchFeeder",
    "Permutation",
    "PermutationReader",
    "PermutationSplit",
    "Permutations",
    "PermutationBuilder",
    "Transforms",
    "permutation_builder",
    "StreamingDataset",
]
