from .orbax_io import CheckpointManager, load_params, save_params  # noqa: F401
from .torch_convert import (  # noqa: F401
    convert_camera_encoder_state_dict,
    convert_clip_text_state_dict,
    convert_lightning_checkpoint,
    convert_unet_state_dict,
    convert_vae_state_dict,
    export_unet_state_dict,
    split_lightning_state_dict,
)
