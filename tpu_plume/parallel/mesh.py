"""Device mesh + sharding layout.

The reference has no distributed/communication layer of any kind — the only
device handling is single-GPU ``.to(device)`` (SURVEY.md §2.3).  Scaling here
is the TPU-native replacement: a 1-D ``jax.sharding.Mesh`` over the "data"
axis; env state, rollout trajectories, and PPO batches are sharded on their
leading env/batch axis while model/optimizer state is replicated.  Under
``jit``, XLA's SPMD partitioner then inserts the collectives (gradient
``psum`` over ICI, metric all-reduces) that NCCL would provide in a torch DDP
stack — there is no hand-written communication code to maintain.

The same code runs single-device (trivial mesh), on a TPU slice, or on a
virtual 8-device CPU mesh for CI
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every leaf on its leading axis across the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_loop_carry(loop: Any, mesh: Mesh) -> Any:
    """Lay out a ppo_trainer.LoopCarry for SPMD: env-parallel state sharded
    on the env axis, learner state and PRNG keys replicated."""
    num_envs = loop.rollout.obs.shape[0]
    n_dev = mesh.devices.size
    if num_envs % n_dev != 0:
        raise ValueError(
            f"num_envs={num_envs} must be divisible by the mesh size {n_dev} "
            f"to shard the env axis evenly"
        )
    rollout = loop.rollout.replace(
        env_state=shard_batch(loop.rollout.env_state, mesh),
        obs=shard_batch(loop.rollout.obs, mesh),
        accum=shard_batch(loop.rollout.accum, mesh),
        key=jax.device_put(loop.rollout.key, NamedSharding(mesh, P())),
        # recurrent-policy carry is per-env [N, H]: shard with the envs
        hidden=(None if loop.rollout.hidden is None
                else shard_batch(loop.rollout.hidden, mesh)),
    )
    return loop.replace(
        train_state=replicate(loop.train_state, mesh),
        rollout=rollout,
        curriculum=replicate(loop.curriculum, mesh),
        key=jax.device_put(loop.key, NamedSharding(mesh, P())),
    )


def shard_gail_carry(carry: Any, mesh: Mesh) -> Any:
    """Lay out a gail_trainer.GAILCarry for SPMD: the PPO loop as
    ``shard_loop_carry``; the discriminator learner replicated — its
    minibatch indexes the env-sharded policy batch and the replicated
    expert bank locally, and XLA all-reduces its gradients exactly like the
    policy's (the NCCL role in a torch DDP GAIL; the reference is
    single-GPU, PPOV1.1/train_ppo_gail.py)."""
    return carry.replace(
        ppo=shard_loop_carry(carry.ppo, mesh),
        disc_state=replicate(carry.disc_state, mesh),
    )
