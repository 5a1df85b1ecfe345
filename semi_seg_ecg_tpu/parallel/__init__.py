from .mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_size,
    make_mesh,
    replicated,
    shard_batch,
)
from .dist import (  # noqa: F401
    get_rank,
    get_world_size,
    init_distributed_mode,
    is_main_process,
)
