from .gae import (
    AE,
    GAE,
    GAEDecoder,
    GAEEncoder,
    PostGAE,
    SREncoder,
    group_indices,
    random_mask,
)

__all__ = [
    "AE",
    "GAE",
    "GAEDecoder",
    "GAEEncoder",
    "PostGAE",
    "SREncoder",
    "group_indices",
    "random_mask",
]
