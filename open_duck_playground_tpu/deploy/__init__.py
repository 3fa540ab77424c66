"""Deployment-side tooling: numpy twins of the reward/reference-motion math,
the sim-to-sim inference harness, obs-trace plotting, and the C++ policy
runtime bindings. NumPy (not JAX) mirrors the reference's deploy stack and
doubles as an independent cross-check of the JAX implementations.
"""
