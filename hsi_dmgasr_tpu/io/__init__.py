from .convert_torch import (
    gae_config_from_module,
    load_state_dict,
    load_torch_gae,
    load_torch_module,
    state_dict_to_flax,
    torch_key_to_flax_path,
)

__all__ = [
    "gae_config_from_module",
    "load_state_dict",
    "load_torch_gae",
    "load_torch_module",
    "state_dict_to_flax",
    "torch_key_to_flax_path",
]
