from twotowermlretrieval_tpu.serve.index import RetrievalIndex  # noqa: F401
from twotowermlretrieval_tpu.serve.inferencer import QueryInferencer  # noqa: F401
from twotowermlretrieval_tpu.serve.engine import SearchEngine  # noqa: F401
from twotowermlretrieval_tpu.serve.simple_hybrid import SimpleHybridRetriever  # noqa: F401
