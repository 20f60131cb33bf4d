from .parity import (
    CarFlagParityDriver,
    CRoomsParityDriver,
    MSRoomsParityDriver,
    RoomsParityDriver,
    TaxiParityDriver,
    reference_rng,
)
from .gym_api import (
    CarVecEnv,
    CRoomsEnv,
    DiscreteActionCarVecEnv,
    ExtendedHansenTaxiVecEnv,
    ExtendedTaxiVecEnv,
    GymnasiumVecAdapter,
    HansenTaxiVecEnv,
    MultistoryFourRoomsEnv,
    RoomsEnv,
    TaxiVecEnv,
)

__all__ = [
    "reference_rng",
    "TaxiParityDriver",
    "RoomsParityDriver",
    "CRoomsParityDriver",
    "CarFlagParityDriver",
    "MSRoomsParityDriver",
    "GymnasiumVecAdapter",
    "TaxiVecEnv",
    "HansenTaxiVecEnv",
    "ExtendedTaxiVecEnv",
    "ExtendedHansenTaxiVecEnv",
    "RoomsEnv",
    "CRoomsEnv",
    "MultistoryFourRoomsEnv",
    "CarVecEnv",
    "DiscreteActionCarVecEnv",
]
