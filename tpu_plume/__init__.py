"""tpu-plume: a TPU-native UAV methane-plume source-localization RL framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference project su1phurd/UAV-WRF-LES-PPO-LSTM (see SURVEY.md): a PPO agent
steered up a synthetic methane-plume concentration field toward the point
source, with curriculum learning on the success radius, an optional GAIL
imitation stage, and an LSTM family that watches the concentration time
series and decides when to stop (declare "source found").

Design principles (TPU-first, not a port):
  - the environment is a pure function; concentration/turbulence are evaluated
    analytically at the query point (procedural hash-based turbulence), so no
    500x500 field is ever materialized per reset;
  - rollouts fuse policy inference with env.step inside one jitted
    ``jax.lax.scan`` over thousands of ``vmap``-ed envs;
  - GAE, the clipped PPO surrogate, and LSTM BPTT run jit-compiled on device;
  - multi-chip scaling via ``jax.sharding.Mesh`` + XLA collectives.
"""

__version__ = "0.1.0"
