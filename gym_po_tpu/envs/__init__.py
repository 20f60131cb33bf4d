from .taxi import Taxi, TaxiState, TAXI_MAP, EXTENDED_TAXI_MAP
from .rooms import Rooms, RoomsState
from .crooms import CRooms, CRoomsState
from .msrooms import MultistoryFourRooms, MSRoomsState
from .car_flag import CarFlag, DiscreteCarFlag, CarFlagState
from .rocksample import RockSample, RockSampleState
from .tag_jax import (
    HeavenHellContinuous,
    HeavenHellState,
    TagContinuous,
    TagState,
)
from .ant_physics import (
    AntHeavenHellPhysics,
    AntHeavenHellPhysicsState,
    AntTagPhysics,
    AntTagPhysicsState,
)
from .shaping import PotentialShaped, heaven_hell_potential, tag_potential

try:  # MuJoCo ant envs need the host mujoco runtime
    from .ant import AntHeavenHellEnv, AntTagEnv

    __all_ant__ = ["AntTagEnv", "AntHeavenHellEnv"]
except ImportError:  # pragma: no cover
    __all_ant__ = []

__all__ = [
    "CarFlag",
    "DiscreteCarFlag",
    "CarFlagState",
    "Taxi",
    "TaxiState",
    "TAXI_MAP",
    "EXTENDED_TAXI_MAP",
    "Rooms",
    "RoomsState",
    "CRooms",
    "CRoomsState",
    "MultistoryFourRooms",
    "MSRoomsState",
    "RockSample",
    "RockSampleState",
    "TagContinuous",
    "TagState",
    "HeavenHellContinuous",
    "HeavenHellState",
    "AntTagPhysics",
    "AntTagPhysicsState",
    "AntHeavenHellPhysics",
    "AntHeavenHellPhysicsState",
    "PotentialShaped",
    "heaven_hell_potential",
    "tag_potential",
]
