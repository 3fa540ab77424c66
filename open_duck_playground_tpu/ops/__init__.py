"""Pure-JAX rigid-body physics pipeline (TPU-first, jit/vmap lockstep).

Modules:
- ``math3d``     : quaternion + spatial (6D) algebra, MuJoCo conventions
- ``smooth``     : kinematics, com quantities, CRB mass matrix, RNE bias
- ``collision``  : convex-hull vs plane / heightfield / convex narrowphase
- ``constraint`` : joint limits, dof friction, pyramidal contact rows
- ``solver``     : Newton constraint solver with exact piecewise linesearch
- ``forward``    : forward dynamics + semi-implicit Euler step + sensors
- ``linalg``     : batched small dense factorizations tuned for TPU
"""
