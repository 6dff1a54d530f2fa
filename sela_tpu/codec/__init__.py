"""JAX end-to-end codec: jit'd batched pipelines + host orchestration."""
from .decoder import decode_sela  # noqa: F401
from .encoder import encode_wav  # noqa: F401
from .pipeline import decode_step, encode_step  # noqa: F401
