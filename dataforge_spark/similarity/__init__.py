from . import brute_force, lsh, pq  # noqa: F401
