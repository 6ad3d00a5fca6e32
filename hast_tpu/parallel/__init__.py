"""Device-mesh sharding, distributed counting, cross-shard merges."""

from hast_tpu.parallel import merge, mesh  # noqa: F401
