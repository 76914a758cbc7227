from .mesh import (DATA_AXIS, make_mesh, replicated, batch_sharded,
                   shard_train_step, put_replicated, put_batch)
