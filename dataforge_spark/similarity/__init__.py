from . import brute_force, lsh, pq, sq  # noqa: F401
