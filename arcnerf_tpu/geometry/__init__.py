"""Pure jax.numpy geometry library.

Same functional surface as the reference torch geometry library
(/root/reference/arcnerf/geometry/): rays, spheres, volumes, poses,
projection, transformation, mesh, triangle, point cloud — but every function
is a pure jnp function safe under jit/vmap/grad, with masks instead of
boolean indexing.
"""
