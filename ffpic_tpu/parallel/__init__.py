from ffpic_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_decode_420,
)

__all__ = ["make_mesh", "shard_batch", "sharded_decode_420"]
