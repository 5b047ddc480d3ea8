from twotowermlretrieval_tpu.parallel.mesh import make_mesh, batch_sharding  # noqa: F401
from twotowermlretrieval_tpu.parallel.distributed import (  # noqa: F401
    make_distributed_train_step,
    make_distributed_eval_step,
    make_sharded_packed_train_step,
    make_sharded_packed_eval_step,
    replicate_state,
)
from twotowermlretrieval_tpu.parallel.embedding import sharded_embedding_lookup  # noqa: F401
from twotowermlretrieval_tpu.parallel.topk import distributed_topk  # noqa: F401
