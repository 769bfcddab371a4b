from mjlab_tpu.distributed.sharding import (  # noqa: F401
  make_env_mesh,
  replicated,
  shard_batched_pytree,
)
