"""Device mesh + sharding rules (batch data parallelism over ICI)."""

from depth_image_captioning_pub_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, batch_sharding)
