"""Environment registry.

The reference configures envs through plain ``__init__`` kwargs and registers
only the two ant envs with gymnasium (reference ``gym_po/envs/__init__.py:9-19``).
Here every environment is constructible by name with kwarg overrides; defaults
preserve every reference default (time limits, rewards, failure probabilities).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

__all__ = ["register", "make", "registered_envs"]

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str, ctor: Callable[..., Any]) -> None:
    if name in _REGISTRY:
        raise ValueError(f"Environment {name!r} already registered")
    _REGISTRY[name] = ctor


def make(name: str, **overrides):
    """Construct a registered environment with kwarg overrides."""
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown environment {name!r}. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**overrides)


def registered_envs():
    return sorted(_REGISTRY)


def _register_defaults() -> None:
    from .envs.taxi import Taxi, EXTENDED_TAXI_MAP

    register("Taxi-v4", lambda **kw: Taxi(**kw))
    register("HansenTaxi-v4", lambda **kw: Taxi(hansen_obs=True, **kw))
    register("ExtendedTaxi-v4", lambda **kw: Taxi(map=EXTENDED_TAXI_MAP, **kw))
    register(
        "ExtendedHansenTaxi-v4",
        lambda **kw: Taxi(map=EXTENDED_TAXI_MAP, hansen_obs=True, **kw),
    )

    def _rooms(**kw):
        from .envs.rooms import Rooms

        return Rooms(**kw)

    def _crooms(**kw):
        from .envs.crooms import CRooms

        return CRooms(**kw)

    register("Rooms-v0", _rooms)
    register("CRooms-v0", _crooms)

    def _msrooms(**kw):
        from .envs.msrooms import MultistoryFourRooms

        return MultistoryFourRooms(**kw)

    register("MultistoryFourRooms-v0", _msrooms)

    def _car(**kw):
        from .envs.car_flag import CarFlag

        return CarFlag(**kw)

    def _dcar(**kw):
        from .envs.car_flag import DiscreteCarFlag

        return DiscreteCarFlag(**kw)

    register("CarFlag-v0", _car)
    register("DiscreteCarFlag-v0", _dcar)

    def _rocksample(**kw):
        from .envs.rocksample import RockSample

        return RockSample(**kw)

    register("RockSample-v0", _rocksample)

    def _tag(**kw):
        from .envs.tag_jax import TagContinuous

        return TagContinuous(**kw)

    def _hh(**kw):
        from .envs.tag_jax import HeavenHellContinuous

        return HeavenHellContinuous(**kw)

    register("TagContinuous-v0", _tag)
    register("HeavenHellContinuous-v0", _hh)

    def _ant_tag(**kw):
        from .envs.ant_physics import AntTagPhysics

        return AntTagPhysics(**kw)

    def _ant_hh(**kw):
        from .envs.ant_physics import AntHeavenHellPhysics

        return AntHeavenHellPhysics(**kw)

    register("AntTagPhysics-v0", _ant_tag)
    register("AntHeavenHellPhysics-v0", _ant_hh)


_register_defaults()
