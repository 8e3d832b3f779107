from . import brute_force, lsh  # noqa: F401
