from . import geometry, bruteforce, pallas_bf, morton, lbvh, traverse  # noqa: F401
