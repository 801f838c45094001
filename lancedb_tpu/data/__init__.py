from .permutation import Permutation, PermutationBuilder, permutation_builder
from .streaming import StreamingDataset

__all__ = ["Permutation", "PermutationBuilder", "permutation_builder", "StreamingDataset"]
