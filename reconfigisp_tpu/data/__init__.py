"""Data layer: datasets, samplers, loaders.

Factory mirroring reference codes/data/__init__.py:9-53.
"""

from reconfigisp_tpu.data.datasets import (
    SyntheticRawDataset, RawPairFolderDataset, SyntheticDetectionDataset,
    PairRecordDataset, OnePlusDetectionDataset, create_dataset)
from reconfigisp_tpu.data.sampler import (
    HalfSplitSampler, Loader, create_search_loaders, create_loader)

__all__ = [
    "SyntheticRawDataset", "RawPairFolderDataset", "SyntheticDetectionDataset",
    "PairRecordDataset", "OnePlusDetectionDataset",
    "create_dataset", "HalfSplitSampler", "Loader",
    "create_search_loaders", "create_loader",
]
