from diffdock_tpu.diffusion.schedules import (
    SigmaConfig,
    t_to_sigma,
    t_to_sigma_individual,
    get_t_schedule,
)
from diffdock_tpu.diffusion.so3 import SO3Tables, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusTables, get_torus_tables
from diffdock_tpu.diffusion.time_embed import (
    sinusoidal_embedding,
    gaussian_fourier_embedding,
    get_timestep_embedding,
)

__all__ = [
    "SigmaConfig",
    "t_to_sigma",
    "t_to_sigma_individual",
    "get_t_schedule",
    "SO3Tables",
    "get_so3_tables",
    "TorusTables",
    "get_torus_tables",
    "sinusoidal_embedding",
    "gaussian_fourier_embedding",
    "get_timestep_embedding",
]
