from twotowermlretrieval_tpu.models.rnn import RNNSpec, init_rnn_encoder, rnn_encode  # noqa: F401
from twotowermlretrieval_tpu.models.two_tower import (  # noqa: F401
    TwoTowerSpec,
    init_two_tower,
    encode_query,
    encode_document,
    two_tower_forward,
)
from twotowermlretrieval_tpu.models.losses import (  # noqa: F401
    triplet_loss_cosine,
    in_batch_softmax_loss,
    combined_loss,
)
