"""On-device PPO actor-learner (Brax-PPO semantics, sharded over a TPU mesh)."""
