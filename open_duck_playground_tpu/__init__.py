"""TPU-native locomotion learning framework for the Open Duck Mini v2 biped.

A ground-up rebuild of the capabilities of Open_Duck_Playground
(reference: /root/reference), designed TPU-first:

- ``mjcf``     : MJCF-subset model compiler -> flat arrays (no mujoco dependency)
- ``ops``      : pure-JAX rigid-body physics pipeline (jit/vmap lockstep)
- ``models``   : robot definitions (Open Duck Mini v2 constants + assets)
- ``envs``     : RL environments (joystick / standing), rewards, randomization
- ``train``    : on-device PPO actor-learner with sharded env batches
- ``parallel`` : device mesh / sharding helpers
- ``export``   : ONNX writer (no external onnx dependency) + numpy interpreter
- ``deploy``   : sim-to-sim inference harness, C++ policy runtime bindings
"""

__version__ = "0.1.0"
