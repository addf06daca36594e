"""Pure, deterministic per-record functions (no Ray imports).

These implement the exact transform semantics the engine promises
(SURVEY.md §2.2/§2.7) and are unit-tested directly on plain Python values;
the Ray stages in ``easyner_ray.stages`` wrap them in vectorized
``map_batches`` bodies.
"""
