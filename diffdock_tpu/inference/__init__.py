from diffdock_tpu.inference.sampler import (
    SamplerConfig,
    randomize_position,
    reverse_diffusion,
)

__all__ = ["SamplerConfig", "randomize_position", "reverse_diffusion"]
