from mjlab_tpu.distributed.multihost import (  # noqa: F401
  global_env_offset,
  initialize_multihost,
  is_primary_host,
  process_count,
  process_index,
)
from mjlab_tpu.distributed.sharding import (  # noqa: F401
  make_env_mesh,
  replicated,
  shard_batched_pytree,
)
