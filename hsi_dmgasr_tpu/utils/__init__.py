from .augment import data_augmentation, paired_random_augment

__all__ = ["data_augmentation", "paired_random_augment"]
