from .mesh import (DATA_AXIS, make_mesh, replicated, batch_sharded,
                   shard_train_step, make_sharded_predict, put_replicated,
                   put_batch)
