"""Trip-count-aware FLOP counter (utils/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_po_tpu.utils.flops import count_flops, flops_of


def test_matmul_counts_2mnk():
    f = lambda a, b: a @ b
    assert flops_of(f, jnp.ones((8, 32)), jnp.ones((32, 16))) == 2 * 8 * 32 * 16


def test_scan_and_fori_multiply_by_trip_count():
    def f(x):
        return jax.lax.fori_loop(0, 10, lambda i, x: x @ x, x)

    assert flops_of(f, jnp.ones((16, 16))) == 10 * 2 * 16 ** 3

    def g(x):
        y, _ = jax.lax.scan(lambda c, _: (c * 2.0, None), x, None, length=7)
        return y

    assert flops_of(g, jnp.ones(5)) == 7 * 5


def test_nested_loops_multiply():
    def f(x):
        def outer(i, x):
            return jax.lax.fori_loop(0, 3, lambda j, y: y + 1.0, x)
        return jax.lax.fori_loop(0, 4, outer, x)

    assert flops_of(f, jnp.ones(2)) == 4 * 3 * 2


def test_integer_and_movement_ops_free():
    def f(x, idx):
        y = x[idx]              # gather: free
        z = jnp.transpose(y)    # movement: free
        return z.astype(jnp.float32)  # convert: free

    assert flops_of(f, jnp.ones((4, 4)), jnp.arange(2)) == 0


def test_while_uses_supplied_trips():
    def f(x):
        return jax.lax.while_loop(
            lambda c: c[1] < 5, lambda c: (c[0] * 2.0, c[1] + 1),
            (x, jnp.int32(0)))

    jx = jax.make_jaxpr(f)(jnp.ones(3))
    base = count_flops(jx)              # default: 1 trip
    five = count_flops(jx, while_trips=lambda eqn: 5.0)
    assert five == 5 * base


def test_ant_engine_counts_are_consistent():
    """rk4 does 4 constrained stages per substep vs euler's 1 → ~4x FLOPs;
    the iters=8 Newton solve dominates iters=1 by the documented ratio."""
    from gym_po_tpu.physics import TAG_WALLS, make_ant_model
    from gym_po_tpu.physics.engine import PhysicsState, step

    model = make_ant_model(TAG_WALLS)
    q = jnp.zeros(15).at[2].set(0.55).at[3].set(1.0)
    v, w, c = jnp.zeros(14), jnp.zeros(14), jnp.zeros(8)

    def fl(integ, iters):
        return flops_of(
            lambda q, v, w, c: step(model, PhysicsState(q, v, w), c,
                                    frame_skip=15, iters=iters,
                                    integrator=integ), q, v, w, c)

    euler8, rk48, euler1 = fl("euler", 8), fl("rk4", 8), fl("euler", 1)
    assert euler8 > 5e6 and rk48 > 2e7  # absolute scale sanity
    np.testing.assert_allclose(rk48 / euler8, 4.0, rtol=0.05)
    assert 3.5 < euler8 / euler1 < 6.0  # Newton iters dominate
