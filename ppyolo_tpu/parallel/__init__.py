from .mesh import (DATA_AXIS, make_mesh, replicated, batch_sharded,
                   shard_train_step, shard_multi_train_step,
                   make_sharded_predict, put_replicated, put_batch,
                   put_scan_batch)
