from twotowermlretrieval_tpu.data.loader import TripletBuilder, load_datasets  # noqa: F401
from twotowermlretrieval_tpu.data.batching import TripletBatcher, Batch  # noqa: F401
from twotowermlretrieval_tpu.data.glove import (  # noqa: F401
    load_embedding_table,
    parse_glove_txt,
)
