"""Core math: vectors, sampling, RNG, geometry — the L0/L1 layers of the
reference (SURVEY.md §1), as pure batched jnp functions."""

from . import geometry, rng, sampling, vec  # noqa: F401
