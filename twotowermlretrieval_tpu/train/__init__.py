from twotowermlretrieval_tpu.train.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    merge_params,
    partition_params,
)
from twotowermlretrieval_tpu.train.evaluators import (  # noqa: F401
    BatchEvaluator,
    CorpusEvaluator,
    TestEvaluator,
)
from twotowermlretrieval_tpu.train.metrics import MetricLogger  # noqa: F401
