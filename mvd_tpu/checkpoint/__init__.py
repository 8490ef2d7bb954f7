from .orbax_io import (  # noqa: F401
    CheckpointManager,
    load_params,
    peek_checkpoint_meta,
    resolve_resume_path,
    save_params,
)
from .torch_convert import (  # noqa: F401
    convert_camera_encoder_state_dict,
    convert_clip_text_state_dict,
    convert_lightning_checkpoint,
    convert_unet_state_dict,
    convert_vae_state_dict,
    export_unet_state_dict,
    split_lightning_state_dict,
    zero_pad_conv_in,
)
