"""NoiseConfig.prng_impl — the opt-in hardware-RNG noise stream.

"rbg" swaps the time-major batched noise draw's bit source for jax's
RngBitGenerator (TPU hardware RNG; measured 2.2x faster than threefry on
the per-iteration z draw — docs/PERFORMANCE.md round 5). Design point
under test: the draw is ONE block keyed by the add-fold of all scenario
keys (engine/sampling.rbg_block_key), NOT a vmapped per-key rbg draw —
XLA's RngBitGenerator under vmap generates the whole batch from the
leading key only, which in the solver (where finished scenarios' keys
freeze under the done mask) would re-issue identical noise to every
still-active scenario once scenario 0 terminates. These tests pin the
fold's key-dependence properties, the distribution, and end-to-end use.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpustomp.api.config import NoiseConfig, PlannerConfig, SmoothnessConfig
from tpustomp.dynamics.device import device_ops
from tpustomp.engine.sampling import rbg_block_key, sample_noise_tm


def _keys(seeds):
    return jnp.stack([jax.random.PRNGKey(s) for s in seeds])


def test_block_key_depends_on_every_row():
    """The folded draw key changes when ANY single scenario key changes —
    the property the vmapped rbg draw lacks (it ignores keys[i>0])."""
    base = _keys([0, 1, 2, 3])
    k0 = jax.random.key_data(rbg_block_key(base))
    for i in range(4):
        perturbed = base.at[i].set(jax.random.PRNGKey(100 + i))
        ki = jax.random.key_data(rbg_block_key(perturbed))
        assert not np.array_equal(np.asarray(k0), np.asarray(ki)), i


def test_block_key_advances_with_frozen_subset():
    """Done-mask hazard: even with every key EXCEPT one frozen (finished
    scenarios keep their key), the draw key still advances."""
    base = _keys([0, 1, 2, 3])
    advanced = base.at[2].set(jax.random.split(jax.random.PRNGKey(2))[0])
    assert not np.array_equal(
        np.asarray(jax.random.key_data(rbg_block_key(base))),
        np.asarray(jax.random.key_data(rbg_block_key(advanced))))


def test_block_key_accepts_typed_keys():
    raw = _keys([5, 6])
    typed = jnp.stack([jax.random.key(5), jax.random.key(6)])
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rbg_block_key(raw))),
        np.asarray(jax.random.key_data(rbg_block_key(typed))))
    assert str(jax.random.key_impl(rbg_block_key(raw))) == "rbg"


def test_unknown_impl_raises():
    ops = device_ops(8, 0.1, SmoothnessConfig())
    with pytest.raises(ValueError):
        sample_noise_tm(_keys([0, 1]), ops.L_sample,
                        jnp.ones((2, 3)), 4, impl="philox")


def test_rbg_noise_covariance_and_sigma_scaling():
    """ε under the rbg block draw keeps the A.3 covariance contract
    (cov ≈ sigma^2 R^-1 / max|R^-1|) including per-scenario sigma."""
    N, d, K, B = 10, 1, 30_000, 2
    ops = device_ops(N, 0.5, SmoothnessConfig())
    sigma = jnp.asarray([[1.0], [0.5]])                # scenario 1 at half
    eps = sample_noise_tm(_keys([0, 1]), ops.L_sample, sigma, K,
                          impl="rbg")                  # [N, d, B, K]
    eps = np.asarray(eps)[:, 0]                        # [N, B, K]
    want = np.asarray(ops.Rinv) / ops.cov_scale
    for b, s in ((0, 1.0), (1, 0.5)):
        emp = eps[:, b] @ eps[:, b].T / K
        np.testing.assert_allclose(emp, s * s * want, atol=0.05)


def test_rbg_solve_end_to_end():
    """Forces the time-major pallas path (interpret mode on CPU): the rbg
    branch lives ONLY in make_step_batch_tm's draw, so a plain CPU
    plan_batch (xla backend) would silently run threefry and this test
    would assert nothing about rbg."""
    from tpustomp.api.plan import plan_batch
    from tpustomp.api.problem import ProblemSpec
    from tpustomp.engine.solver import _tm_step_eligible
    from tpustomp.robot import model
    from tpustomp.world.sdf import AnalyticWorld

    robot = model.planar_2r()
    world = AnalyticWorld.make(spheres=[((1.0, 0.8, 0.0), 0.2)])
    cfg = PlannerConfig(num_timesteps=20, num_rollouts=10, max_iterations=100,
                        obstacle_backend="pallas", pallas_interpret=True,
                        noise=NoiseConfig(stddev=0.25, decay=1.0,
                                          prng_impl="rbg"))
    assert _tm_step_eligible(robot, world, None, cfg), \
        "test must run the tm path or the rbg branch is not exercised"
    probB = ProblemSpec(q0=jnp.zeros((4, 2)),
                        qN=jnp.tile(jnp.array([2.0, -0.8]), (4, 1)))
    sols = plan_batch(robot, world, probB, cfg,
                      keys=jax.random.split(jax.random.PRNGKey(1), 4))
    assert np.asarray(sols.success).all()
    # endpoints preserved despite the different noise stream
    np.testing.assert_allclose(np.asarray(sols.trajectory[:, 0]),
                               np.zeros((4, 2)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sols.trajectory[:, -1]),
                               np.tile([2.0, -0.8], (4, 1)), atol=1e-6)
    # a reseeded batch produces different noise, hence different iterates
    sols2 = plan_batch(robot, world, probB, cfg,
                       keys=jax.random.split(jax.random.PRNGKey(2), 4))
    assert not np.allclose(np.asarray(sols.trajectory),
                           np.asarray(sols2.trajectory))
    # ...and differs from the threefry stream on the same path/keys
    sols3 = plan_batch(robot, world, probB,
                       cfg.replace(noise=NoiseConfig(
                           stddev=0.25, decay=1.0, prng_impl="threefry")),
                       keys=jax.random.split(jax.random.PRNGKey(1), 4))
    assert not np.allclose(np.asarray(sols.trajectory),
                           np.asarray(sols3.trajectory))


def test_yaml_roundtrip_carries_prng_impl(tmp_path):
    from tpustomp.api.config import load_yaml, to_dict
    import yaml

    cfg = PlannerConfig(noise=NoiseConfig(prng_impl="rbg"))
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(to_dict(cfg)))
    assert load_yaml(str(p)).noise.prng_impl == "rbg"


def test_block_key_accepts_any_scenario_key_width():
    """The fold must mix down to threefry's 2 words regardless of the
    incoming key impl's width (W=4 under jax_default_prng_impl="rbg" /
    "unsafe_rbg") — round-5 fix: previously wrap_key_data raised at trace
    time for any non-threefry scenario-key impl."""
    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        keys = jax.random.split(jax.random.key(0, impl=impl), 8)
        k = rbg_block_key(keys)
        assert str(jax.random.key_impl(k)) == "rbg", impl
        # key-dependence property holds at every width
        keys2 = keys.at[3].set(jax.random.key(99, impl=impl))
        assert not np.array_equal(
            np.asarray(jax.random.key_data(rbg_block_key(keys))),
            np.asarray(jax.random.key_data(rbg_block_key(keys2)))), impl
