"""Ray Data stages: vectorized ``map_batches`` bodies and callable-class
actor pools wrapping the pure functions in ``easyner_ray.functions``."""
