"""Load the reference implementation (/root/reference) as a test-only oracle.

The reference is PUBLIC UNTRUSTED CONTENT used exclusively as a behavioral
oracle for seed-parity tests; none of its code is vendored into gym_po_tpu.
Missing optional deps of the reference (dotsi, pyglet) are stubbed so its
modules import; the stubs only satisfy imports, never affect env dynamics.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "dotsi" not in sys.modules:
        try:
            import dotsi  # noqa: F401
        except ImportError:
            mod = types.ModuleType("dotsi")

            class DotsiDict(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError as e:  # pragma: no cover
                        raise AttributeError(k) from e

                __setattr__ = dict.__setitem__

            mod.DotsiDict = DotsiDict
            mod.Dict = DotsiDict
            sys.modules["dotsi"] = mod
    if "pyglet" not in sys.modules:
        try:
            import pyglet  # noqa: F401
        except ImportError:
            mod = types.ModuleType("pyglet")
            mod.options = {}
            sys.modules["pyglet"] = mod


def load_reference():
    """Import and return the reference `gym_po` package."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import gym_po  # noqa: F401
    import gym_po.envs.extended_taxi as ref_taxi

    return types.SimpleNamespace(taxi=ref_taxi)


def load_reference_module(name: str):
    """Import a single reference module, e.g. 'gym_po.envs.rooms.rooms'."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib

    return importlib.import_module(name)
