from .taxi import Taxi, TaxiState, TAXI_MAP, EXTENDED_TAXI_MAP
from .rooms import Rooms, RoomsState
from .crooms import CRooms, CRoomsState
from .msrooms import MultistoryFourRooms, MSRoomsState
from .car_flag import CarFlag, DiscreteCarFlag, CarFlagState

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
]
