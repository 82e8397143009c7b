"""Worker script for the multi-host distributed test.

Launched as: python multihost_worker.py <process_id> <num_processes> <port>
Each process contributes 4 virtual CPU devices; the global (data, map) mesh
spans processes, so the map-axis collectives (all_gather of NN distances,
psum of normal equations) genuinely cross process boundaries — the CPU-level
stand-in for a multi-host TPU pod slice (SURVEY.md section 5.8).
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kinematic_icp_tpu import Config  # noqa: E402
from kinematic_icp_tpu.parallel import (init_sharded_state, make_mesh,  # noqa: E402
                                        make_sharded_step)

assert len(jax.devices()) == 4 * nprocs, jax.devices()

# data axis spans processes (2 global), map axis within+across (4)
mesh = make_mesh(data=2, map=4)
batch = 2
cfg = Config(max_points=512, max_downsampled=512, max_source=256,
             map_capacity=4 * 512, voxel_size=1.0, max_range=60.0,
             max_probes=4, deskew=True)

state = init_sharded_state(cfg, mesh, batch)
step = make_sharded_step(cfg, mesh)

rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-20, 20, (batch, cfg.max_points, 3))
                  .astype(np.float32))
ts = jnp.asarray(rng.uniform(0, 1, (batch, cfg.max_points)).astype(np.float32))
mask = jnp.ones((batch, cfg.max_points), bool)
has_ts = jnp.ones((batch,), bool)
rel = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
rel[:, 0, 3] = 0.3
active = jnp.ones((batch,), bool)

for i in range(2):
    state, out = step(state, pts, ts, mask, has_ts, jnp.eye(4),
                      jnp.asarray(rel), active)

# replicate the pose so every process can fetch it
fetch = jax.jit(lambda p: p, out_shardings=NamedSharding(mesh, P()))
poses = np.asarray(fetch(out.pose))
assert poses.shape == (batch, 4, 4)
assert np.all(np.isfinite(poses))
# after two identical 0.3m forward deltas the pose must have advanced
assert 0.3 < poses[0, 0, 3] < 0.9, poses[0, 0, 3]
print(f"proc {pid}: OK pose_x={poses[0, 0, 3]:.3f}")
