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


def _repair_reference():
    """Repair the reference's corrupted type annotations (semantics unchanged).

    Several reference functions have mangled signatures where a ': NDArray'
    annotation lost its colon (e.g. ``selected_prob_matrixNDArray`` in
    ``action_utils.py:74``), making the shipped code NameError at runtime.
    We rebind a faithful reconstruction — identical body, identical RNG
    consumption — so the reference can serve as a runtime oracle.
    """
    import numpy as np
    import gym_po.envs.rooms.action_utils as au

    if getattr(au, "_gpt_repaired", False):
        return

    def vectorized_multinomial_with_rng(
        selected_prob_matrix, rng=np.random.default_rng()
    ):
        # exact body of reference action_utils.py:73-90
        random_numbers = rng.random(selected_prob_matrix.shape[0])
        s = selected_prob_matrix.cumsum(axis=1)
        return (s < np.expand_dims(random_numbers, axis=-1)).sum(axis=1)

    au.vectorized_multinomial_with_rng = vectorized_multinomial_with_rng
    au._gpt_repaired = True
    # modules that star-imported the broken binding
    import gym_po.envs.rooms.rooms as rrooms
    import gym_po.envs.rooms.crooms as rcrooms
    import gym_po.envs.rooms.msrooms as rmsrooms

    for mod in (rrooms, rcrooms, rmsrooms):
        mod.vectorized_multinomial_with_rng = vectorized_multinomial_with_rng

    _repair_msrooms(rmsrooms)


def _repair_msrooms(ms):
    """Mechanically de-mangle reference msrooms.py (same corrupted-annotation
    class of defect: ``agent_zyxNDArray`` etc. at msrooms.py:132,163,193,383,
    415,419).  Bodies below are faithful reconstructions with identical
    NumPy ops and RNG consumption; only parameter names are restored."""
    import gymnasium
    import numpy as np
    from gym_po.envs.rooms.observations import (
        get_number_discrete_states_and_conversion,
    )

    MAX_GR_CNST = ms.MAX_GR_CNST
    GR_CNST = ms.GR_CNST

    def get_hansen_vector_obs(agent_zyx, grid, goal_zyx=None, hansen_n=8):
        # reference msrooms.py:147-159
        a = ms.ACTIONS_CARDINAL_Z if hansen_n == 4 else ms.ACTIONS_ORDINAL_Z
        a = a[None, :]
        coords = agent_zyx[:, None] + a
        squares = grid[tuple(coords.transpose(2, 0, 1))]
        squares[(squares > 0) & (squares <= MAX_GR_CNST)] = 2
        squares[squares > MAX_GR_CNST] = 1
        if goal_zyx is not None:
            is_goal = (goal_zyx[:, None] == coords).all(-1)
            squares[is_goal] = 3
        return squares

    def get_hansen_obs(agent_zyx, ms_grid, goal_zyx, hansen_n=8):
        # reference msrooms.py:175-189
        a = ms.ACTIONS_CARDINAL_Z if hansen_n == 4 else ms.ACTIONS_ORDINAL_Z
        a = a[None, :]
        coords = agent_zyx[:, None] + a
        where_is_goal = np.nonzero((goal_zyx[:, None] == coords).all(-1))
        goal_mult = np.ones(goal_zyx.shape[0])
        goal_mult[where_is_goal[0]] = where_is_goal[1] + 1
        squares = ms_grid[tuple(coords.transpose(2, 0, 1))]
        squares[(squares > 0) & (squares <= MAX_GR_CNST)] = 2
        squares[squares > MAX_GR_CNST] = 1
        multipliers = np.array([3**i for i in range(a.shape[1])])
        return squares.dot(multipliers) * goal_mult

    def get_observation_space_and_function(obs_type, ms_grid, obs_n=3):
        # reference msrooms.py:196-254 ('room' branch omitted: shape-broken
        # upstream of the annotation damage, never constructible)
        is_vector = "vector" in obs_type
        has_goal = "goal" in obs_type
        a_max = np.array(ms_grid.shape) - 2
        a_max[0] += 1
        a_min = np.array([0, 1, 1])
        if "mdp" in obs_type:
            if is_vector:
                if has_goal:
                    space = gymnasium.spaces.Box(
                        np.tile(a_min, 2), np.tile(a_max, 2), (6,), dtype=int
                    )
                    obs = lambda azyx, gzyx: np.concatenate((azyx, gzyx), -1)
                else:
                    space = gymnasium.spaces.Box(a_min, a_max, (3,), dtype=int)
                    obs = lambda azyx, gzyx: azyx
            else:
                n, state_grid = get_number_discrete_states_and_conversion(
                    ms_grid - 1
                )
                if has_goal:
                    space = gymnasium.spaces.Discrete(int(n**2))
                    obs = lambda azyx, gzyx: state_grid[tuple(azyx.T)] + n * (
                        state_grid[tuple(gzyx.T)]
                    )
                else:
                    space = gymnasium.spaces.Discrete(int(n))
                    obs = lambda azyx, gzyx: state_grid[tuple(azyx.T)]
        elif "hansen" in obs_type:
            base_n = 8 if "8" in obs_type else 4
            if is_vector:
                if has_goal:
                    space = gymnasium.spaces.Box(0, 3, (base_n,), dtype=int)
                    obs = lambda azyx, gzyx: get_hansen_vector_obs(
                        azyx, ms_grid, gzyx, base_n
                    )
                else:
                    space = gymnasium.spaces.Box(0, 2, (base_n,), dtype=int)
                    obs = lambda azyx, gzyx: get_hansen_vector_obs(
                        azyx, ms_grid, None, base_n
                    )
            else:
                space = gymnasium.spaces.Discrete(int(3**base_n * (base_n + 1)))
                obs = lambda azyx, gzyx: get_hansen_obs(azyx, ms_grid, gzyx, base_n)
        else:
            raise NotImplementedError("Observation type not recognized")
        return space, obs

    def _reset_some(self, mask):
        # reference msrooms.py:383-388
        if b := mask.sum():
            self.elapsed[mask] = 0
            self.goal_zyx[mask] = self._sample_goal(b, self.np_random)
            self.agent_zyx[mask] = self._sample_agent(b, self.np_random)

    def _out_of_bounds(self, proposed_zyx):
        # reference msrooms.py:415-417
        return self.grid[tuple(proposed_zyx.T)] == GR_CNST.wall

    def _transit_stairs(self, moved):
        # reference msrooms.py:419-428
        go_up = (self.grid[tuple(self.agent_zyx.T)] == GR_CNST.stair_up) & moved
        go_down = (self.grid[tuple(self.agent_zyx.T)] == GR_CNST.stair_down) & moved
        if go_up.any():
            self.agent_zyx[go_up, 0] += 1
            self.agent_zyx[go_up, 1:] = ms.SW_NP
        if go_down.any():
            self.agent_zyx[go_down, 0] -= 1
            self.agent_zyx[go_down, 1:] = ms.NE_NP

    ms.get_hansen_vector_obs = get_hansen_vector_obs
    ms.get_hansen_obs = get_hansen_obs
    ms.get_observation_space_and_function = get_observation_space_and_function
    ms.MultistoryFourRoomsEnv._reset_some = _reset_some
    ms.MultistoryFourRoomsEnv._out_of_bounds = _out_of_bounds
    ms.MultistoryFourRoomsEnv._transit_stairs = _transit_stairs


def load_reference_module(name: str):
    """Import a single reference module, e.g. 'gym_po.envs.rooms.rooms'."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib

    mod = importlib.import_module(name)
    _repair_reference()
    return mod
