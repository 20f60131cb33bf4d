"""gym-po-tpu: TPU-native vectorized partially-observable RL environment suite.

A from-scratch JAX/XLA re-design of the capabilities of ``gym_po``
(DavidSlayback/gym-po-taxi): pure-functional envs with in-graph autoreset,
counter-based PRNG, jit+vmap batching, shard_map multi-host scaling, and a
Podracer-style learner — plus a bit-exact NumPy-parity harness for validation
against the reference under fixed seeds.
"""

__version__ = "0.1.0"

from .core import Box, Discrete, Environment, EnvState, Space
from .registry import make, register, registered_envs

__all__ = [
    "Environment",
    "EnvState",
    "Space",
    "Discrete",
    "Box",
    "make",
    "register",
    "registered_envs",
    "__version__",
]
