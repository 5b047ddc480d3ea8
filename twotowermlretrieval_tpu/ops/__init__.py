from twotowermlretrieval_tpu.ops.tfidf import (  # noqa: F401
    TfidfVectorizer,
    cosine_similarity,
    hybrid_blend,
)
