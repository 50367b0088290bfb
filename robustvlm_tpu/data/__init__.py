from robustvlm_tpu.data.loaders import (
    DataLoader,
    ImageFolderDataset,
    SyntheticClassificationDataset,
    load_cifar10,
)

__all__ = [
    "DataLoader",
    "ImageFolderDataset",
    "SyntheticClassificationDataset",
    "load_cifar10",
]
