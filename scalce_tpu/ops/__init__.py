"""Device ops: pure-XLA reference implementations + Pallas variants.

Every op ships a pure ``jnp``/``lax`` implementation first (runs on the CPU
backend for CI and is the fallback when Pallas is unavailable); Pallas
kernels are layered on where they beat XLA (SURVEY.md §8 step 0).
"""
