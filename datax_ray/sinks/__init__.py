from datax_ray.sinks.lake import read_lake, read_lake_table  # noqa: F401
