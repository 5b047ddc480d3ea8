"""Native TF-IDF parity vs sklearn (the reference's vectorizer,
ref: backend/main.py:140-149, frontend/main.py:119-124)."""

import numpy as np
import pytest

from twotowermlretrieval_tpu.ops.tfidf import TfidfVectorizer, cosine_similarity, hybrid_blend

DOCS = [
    "Machine learning algorithms learn from data",
    "Deep neural networks have multiple layers",
    "Natural language processing understands text",
    "Computer vision processes images and video",
    "the and of to in is was",  # all stop words
    "data data data learning",
]


def test_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.feature_extraction.text")
    ref = sklearn.TfidfVectorizer(stop_words="english", max_features=20000)
    ref_matrix = ref.fit_transform(DOCS)

    ours = TfidfVectorizer(max_features=20000)
    our_matrix = ours.fit_transform(DOCS)

    assert ours.vocabulary_ == {t: int(i) for t, i in ref.vocabulary_.items()}
    np.testing.assert_allclose(our_matrix.toarray(), ref_matrix.toarray(), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.idf_, ref.idf_, rtol=1e-9)

    # transform on unseen text
    queries = ["machine learning data", "zzz unseen words only", ""]
    np.testing.assert_allclose(
        ours.transform(queries).toarray(), ref.transform(queries).toarray(), rtol=1e-9, atol=1e-12
    )


def test_matches_sklearn_max_features():
    sklearn = pytest.importorskip("sklearn.feature_extraction.text")
    ref = sklearn.TfidfVectorizer(stop_words="english", max_features=5)
    ref_m = ref.fit_transform(DOCS)
    ours = TfidfVectorizer(max_features=5)
    our_m = ours.fit_transform(DOCS)
    assert ours.vocabulary_ == {t: int(i) for t, i in ref.vocabulary_.items()}
    np.testing.assert_allclose(our_m.toarray(), ref_m.toarray(), rtol=1e-9, atol=1e-12)


def test_cosine_similarity_matches_sklearn():
    skpair = pytest.importorskip("sklearn.metrics.pairwise")
    v = TfidfVectorizer()
    m = v.fit_transform(DOCS)
    q = v.transform(["neural network layers", "machine data"])
    ours = cosine_similarity(q, m)
    theirs = skpair.cosine_similarity(q, m)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def test_all_stopword_doc_is_zero_row():
    v = TfidfVectorizer()
    m = v.fit_transform(DOCS)
    assert m[4].nnz == 0  # zero row stays zero (no NaN from normalization)


def test_transform_before_fit_raises():
    with pytest.raises(RuntimeError):
        TfidfVectorizer().transform(["x"])


def test_hybrid_blend():
    dense = np.array([1.0, 0.0])
    sparse = np.array([0.0, 1.0])
    np.testing.assert_allclose(hybrid_blend(dense, sparse, 0.7), [0.7, 0.3])
    np.testing.assert_allclose(hybrid_blend(dense, sparse, 0.0), sparse)


def test_pickle_roundtrip(tmp_path):
    import pickle

    v = TfidfVectorizer()
    m = v.fit_transform(DOCS)
    with open(tmp_path / "tfidf_artifacts.pkl", "wb") as f:
        pickle.dump({"vectorizer": v, "matrix": m}, f)
    with open(tmp_path / "tfidf_artifacts.pkl", "rb") as f:
        loaded = pickle.load(f)
    np.testing.assert_allclose(
        loaded["vectorizer"].transform(["machine learning"]).toarray(),
        v.transform(["machine learning"]).toarray(),
    )
