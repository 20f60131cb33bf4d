"""Grid utility parity vs the reference's grid_utils helpers."""

import numpy as np

from gym_po_tpu.utils.grid import (
    DIRECTIONS_2D,
    DIRECTIONS_3D,
    coord_to_flat,
    flat_to_coord,
    hansen_indices,
    surrounding_indices,
)

from _reference import load_reference_module


def test_direction_banks_match_reference():
    ref = load_reference_module("gym_po.envs.grid_utils")
    np.testing.assert_array_equal(DIRECTIONS_2D, ref.DIRECTIONS_2D_NP)
    np.testing.assert_array_equal(DIRECTIONS_3D, ref.DIRECTIONS_3D_NP)


def test_surrounding_indices_match_reference():
    ref = load_reference_module("gym_po.envs.grid_utils")
    for surround in (1, 2):
        coords = np.array([[2, 2], [4, 4], [8, 8]]).T
        np.testing.assert_array_equal(
            surrounding_indices(coords, surround),
            ref.get_surrounding_indices(coords, surround),
        )
    c3 = np.array([[0, 2, 2], [1, 4, 4]]).T
    np.testing.assert_array_equal(
        surrounding_indices(c3, 1), ref.get_surrounding_indices(c3, 1)
    )


def test_hansen_indices():
    # NOTE: the reference's get_hansen_indices crashes as shipped
    # (grid_utils.py:75: list `g` has no np broadcasting; and the 3-D pad
    # loop mutates a list while using `g[:, None]`) — semantic test instead.
    out = hansen_indices(np.array([5, 7]))
    assert out.shape == (2, 1, 4)
    np.testing.assert_array_equal(
        out[:, 0].T, np.array([[4, 7], [6, 7], [5, 6], [5, 8]])
    )


def test_flat_coord_roundtrip_matches_reference():
    ref = load_reference_module("gym_po.envs.grid_utils")
    shape = (3, 7, 5)
    flats = np.arange(3 * 7 * 5)
    ours = flat_to_coord(shape)(flats)
    theirs = ref.get_flat_to_coord_function(shape)(flats)
    np.testing.assert_array_equal(ours, theirs)
    back_ours = coord_to_flat(shape)(ours)
    back_theirs = ref.get_coord_to_flat_function(shape)(tuple(theirs))
    np.testing.assert_array_equal(back_ours, back_theirs)
    np.testing.assert_array_equal(back_ours, flats)
