from .torch_ckpt import (convert_state_dict, expected_reference_keys,
                         load_torch_checkpoint, save_converted,
                         load_convert_meta)

__all__ = ["convert_state_dict", "expected_reference_keys",
           "load_torch_checkpoint", "save_converted", "load_convert_meta"]
