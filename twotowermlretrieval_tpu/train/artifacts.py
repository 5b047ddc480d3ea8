"""The training <-> serving artifact contract.

The reference couples training and serving through exactly one on-disk
directory (ref: backend/main.py:92-153): ``model.pth``, enriched
``config.json``, ``word_to_idx.pkl``, deduped ``documents.pkl``,
``document_embeddings.npy``, ``tfidf_artifacts.pkl``. We keep the same
six-file contract (file names and pickle/npy formats identical where the
content is framework-neutral); the model weights are ``model.npz`` (a plain
path->array archive) instead of a torch state_dict.

Loading (the serving side, ref: query_inferencer.py:23-57) is
:func:`load_artifacts`, returning everything needed to rebuild the exact
architecture — VOCAB_SIZE/EMBED_DIM are persisted in config.json just like
the reference (backend/main.py:101-106).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

from twotowermlretrieval_tpu.config import Config
from twotowermlretrieval_tpu.encoder import TextEncoder
from twotowermlretrieval_tpu.models.two_tower import TwoTowerSpec
from twotowermlretrieval_tpu.ops.tfidf import TfidfVectorizer
from twotowermlretrieval_tpu.tokenizer import Tokenizer
from twotowermlretrieval_tpu.utils.pytree import load_params_npz, save_params_npz

MODEL_FILE = "model.npz"

Triplet = Tuple[str, str, str]


def collect_unique_documents(datasets: Dict[str, Sequence[Triplet]]) -> List[str]:
    """Dedup positives+negatives across all splits (ref: backend/main.py:115-122).
    Insertion-ordered (the reference's set() order is hash-randomized —
    SURVEY.md §7 determinism fix)."""
    docs: Dict[str, None] = {}
    for split_data in datasets.values():
        for _, pos_doc, neg_doc in split_data:
            docs.setdefault(pos_doc)
            docs.setdefault(neg_doc)
    return list(docs.keys())


def save_inference_artifacts(
    output_dir: str | Path,
    params,
    config: Config,
    tokenizer: Tokenizer,
    datasets: Dict[str, Sequence[Triplet]],
    encoder: TextEncoder | None = None,
    tfidf_max_features: int = 20000,
    build_ivf_index: bool = False,
    ivf_storage_dtype: str = "bfloat16",
    ivf_num_clusters: int = 0,
) -> Path:
    """Export the six-file serving contract (ref: backend/main.py:92-153).

    With ``build_ivf_index`` a seventh file, ``ivf_index.npz``, carries the
    prebuilt IVF index so serving cold-starts without re-running k-means —
    the offline/online split the reference implements as the
    save_to_chromaDB notebook (ref: frontend/save_to_chromaDB.ipynb)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    # 1. model weights
    save_params_npz(output_dir / MODEL_FILE, params)

    # 2. config enriched with runtime-derived keys (ref: backend/main.py:101-106).
    # Train-time placement knobs are neutralized: the artifact config is the
    # serving-side architecture contract, and serving rehydrates towers
    # single-device (a persisted shard_embedding_table would make the spec
    # demand a 'model' mesh axis at inference).
    enriched = config.replace(
        vocab_size=tokenizer.vocab_size(),
        embed_dim=config.embed_dim,
        shard_embedding_table=False,
        mesh_model=1,
    )
    enriched.to_json(output_dir / "config.json")

    # 3. tokenizer vocab (ref: backend/main.py:109)
    tokenizer.save(output_dir / "word_to_idx.pkl")

    # 4. documents + doc-tower embeddings (ref: backend/main.py:112-138)
    unique_docs = collect_unique_documents(datasets)
    if encoder is None:
        spec = TwoTowerSpec.from_config(enriched)
        encoder = TextEncoder(
            params, spec, tokenizer,
            batch_size=config.batch_size,
            max_query_len=config.max_query_len,
            max_doc_len=config.max_doc_len,
        )
    doc_embeddings = encoder.encode_documents(unique_docs)
    with open(output_dir / "documents.pkl", "wb") as f:
        pickle.dump(unique_docs, f)
    np.save(output_dir / "document_embeddings.npy", doc_embeddings)

    # 5. TF-IDF vectorizer + doc matrix (ref: backend/main.py:140-149)
    vectorizer = TfidfVectorizer(max_features=tfidf_max_features)
    matrix = vectorizer.fit_transform(unique_docs)
    with open(output_dir / "tfidf_artifacts.pkl", "wb") as f:
        pickle.dump({"vectorizer": vectorizer, "matrix": matrix}, f)

    # 6. optional prebuilt IVF index (offline build, online load)
    if build_ivf_index:
        from twotowermlretrieval_tpu.ops.ivf import IVF_INDEX_FILE, build_ivf, save_ivf

        index = build_ivf(
            np.asarray(doc_embeddings, np.float32),
            num_clusters=ivf_num_clusters,
            storage_dtype=ivf_storage_dtype,
        )
        save_ivf(output_dir / IVF_INDEX_FILE, index)

    return output_dir


class LoadedArtifacts(NamedTuple):
    config: Config
    tokenizer: Tokenizer
    params: dict
    spec: TwoTowerSpec
    documents: List[str]
    doc_embeddings: np.ndarray
    tfidf_vectorizer: TfidfVectorizer
    tfidf_matrix: object  # scipy CSR
    ivf_index: object = None  # prebuilt ops.ivf.IVFIndex if exported


def load_artifacts(artifacts_path: str | Path, require_index: bool = True) -> LoadedArtifacts:
    """Rehydrate an artifact directory (ref: query_inferencer.py:23-57 +
    frontend/main.py:42-70). With require_index=False only the model side
    (config/tokenizer/params) is loaded."""
    artifacts_path = Path(artifacts_path)
    if not artifacts_path.exists():
        raise FileNotFoundError(f"artifacts directory not found: {artifacts_path}")

    config = Config.from_json(artifacts_path / "config.json")
    tokenizer = Tokenizer.from_pickle(artifacts_path / "word_to_idx.pkl")
    config = config.replace(vocab_size=tokenizer.vocab_size())
    if config.embed_dim is None:
        config = config.replace(embed_dim=200)  # ref fallback: query_inferencer.py:47-48
    params = load_params_npz(artifacts_path / MODEL_FILE)
    spec = TwoTowerSpec.from_config(config)

    documents: List[str] = []
    doc_embeddings = np.zeros((0, config.hidden_dim), np.float32)
    vectorizer, matrix, ivf_index = None, None, None
    if require_index:
        with open(artifacts_path / "documents.pkl", "rb") as f:
            documents = pickle.load(f)
        doc_embeddings = np.load(artifacts_path / "document_embeddings.npy")
        with open(artifacts_path / "tfidf_artifacts.pkl", "rb") as f:
            tfidf = pickle.load(f)
        vectorizer, matrix = tfidf["vectorizer"], tfidf["matrix"]
        ivf_file = artifacts_path / "ivf_index.npz"
        if ivf_file.exists():
            from twotowermlretrieval_tpu.ops.ivf import load_ivf

            ivf_index = load_ivf(ivf_file)

    return LoadedArtifacts(
        config=config,
        tokenizer=tokenizer,
        params=params,
        spec=spec,
        documents=documents,
        doc_embeddings=doc_embeddings,
        tfidf_vectorizer=vectorizer,
        tfidf_matrix=matrix,
        ivf_index=ivf_index,
    )
