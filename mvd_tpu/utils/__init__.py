from .backend import require_backend, tpu_usable  # noqa: F401
from .images import load_image, save_image, side_by_side, to_uint8  # noqa: F401
from .logging import (  # noqa: F401
    MetricLogger,
    check_finite,
    create_output_dirs,
    enable_compilation_cache,
    enable_nan_debugging,
    log_debug,
)
