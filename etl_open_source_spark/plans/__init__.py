"""Pipeline-spec layer — the reference's Task/Step/Connection model
(core/models.py:9-40) re-expressed as JSON specs + a Spark runner."""
