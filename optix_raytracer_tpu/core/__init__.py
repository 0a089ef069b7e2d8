from . import vecmath, rays, aabb, transforms, rng, camera, film  # noqa: F401
