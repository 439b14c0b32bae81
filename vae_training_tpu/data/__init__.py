from .base import DistributionDataset, pad_with_zeros, padding_energy
from .images import ImageDataset
from .registry import dataset_names, get_dataset, register_dataset
from .synthetic import (
    GaussianDataset,
    LinearGaussianDataset,
    SigmoidDataset,
    SphereDataset,
)

__all__ = [
    "DistributionDataset",
    "ImageDataset",
    "GaussianDataset",
    "LinearGaussianDataset",
    "SigmoidDataset",
    "SphereDataset",
    "dataset_names",
    "get_dataset",
    "register_dataset",
    "pad_with_zeros",
    "padding_energy",
]
