"""Data pipeline: dataset loading (raw files or synthetic twins) + batching."""

from .batches import Batches
from .datasets import DATASETS, dataset_spec, load_dataset

__all__ = ["load_dataset", "dataset_spec", "DATASETS", "Batches"]
