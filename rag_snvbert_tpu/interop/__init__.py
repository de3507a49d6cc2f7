from .torch_ckpt import (convert_state_dict, expected_reference_keys,
                         export_state_dict, load_convert_meta,
                         load_params_checkpoint, load_torch_checkpoint,
                         save_converted)

__all__ = ["convert_state_dict", "expected_reference_keys",
           "export_state_dict", "load_convert_meta",
           "load_params_checkpoint", "load_torch_checkpoint",
           "save_converted"]
