from .gae import AE, GAE, GAEDecoder, GAEEncoder, SREncoder, group_indices

__all__ = ["AE", "GAE", "GAEDecoder", "GAEEncoder", "SREncoder", "group_indices"]
