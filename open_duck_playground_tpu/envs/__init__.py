"""RL environments for the Open Duck Mini v2 (functional, jit/vmap lockstep)."""
