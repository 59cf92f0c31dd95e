from .imresize import imresize, make_imresize_jax
from .interp import torch_bicubic_resize
from .hs_datasets import HSTestData, HSTrainingData
from .mat_folder import PairedMatDataset, TestsetFromFolder, TrainsetFromFolder
from .lrhr import LRHRDataset
from .loader import DataLoader
from .factory import create_dataloader, create_dataset

__all__ = [
    "DataLoader",
    "HSTestData",
    "HSTrainingData",
    "LRHRDataset",
    "PairedMatDataset",
    "TestsetFromFolder",
    "TrainsetFromFolder",
    "create_dataloader",
    "create_dataset",
    "imresize",
    "make_imresize_jax",
    "torch_bicubic_resize",
]
