from .datasets import (
    ImageFolderDataset,
    ImageNet64Dataset,
    SyntheticImages,
    RandomScaledImages,
)
from .loader import DataLoader, CommonDataLoader, CustomDataLoader

__all__ = [
    "ImageFolderDataset",
    "ImageNet64Dataset",
    "SyntheticImages",
    "RandomScaledImages",
    "DataLoader",
    "CommonDataLoader",
    "CustomDataLoader",
]
