"""Data pipeline tests: triplet builder determinism, batching, GloVe table."""

import json

import numpy as np
import pytest

from twotowermlretrieval_tpu.data.batching import Batch, TripletBatcher, tokenize_corpus
from twotowermlretrieval_tpu.data.glove import load_embedding_table, parse_glove_txt
from twotowermlretrieval_tpu.data.loader import TripletBuilder, _split_seed
from twotowermlretrieval_tpu.tokenizer import Tokenizer


def test_split_seeds_match_reference():
    # ref data_loader.py:22-27 — seed chosen by path substring
    assert _split_seed("data/ms_marco_train.parquet") == 42
    assert _split_seed("data/ms_marco_validation.parquet") == 123
    assert _split_seed("data/ms_marco_test.parquet") == 456


def test_triplet_builder_deterministic(synth_config):
    b1 = TripletBuilder(synth_config).load_datasets(subsample_ratio=0.5)
    b2 = TripletBuilder(synth_config).load_datasets(subsample_ratio=0.5)
    assert b1["train"] == b2["train"]
    assert b1["validation"] == b2["validation"]
    assert len(b1["train"]) > 0


def test_triplet_negative_from_other_query(synth_config):
    data = TripletBuilder(synth_config).load_datasets()["train"]
    for query, pos, neg in data[:50]:
        assert isinstance(query, str) and isinstance(pos, str) and isinstance(neg, str)
        assert pos != ""  # positives come from the query's own passages
    # retrieval mode: one triplet per query by default
    assert len(data) > 0


def test_ranking_mode(synth_config):
    cfg = synth_config.replace(training_mode="ranking")
    data = TripletBuilder(cfg).load_datasets()["train"]
    assert len(data) > 0
    # In the synthetic corpus, passage 0 is is_selected=1 — so the positive
    # of each triplet must be its query's first passage.
    import pandas as pd

    df = pd.read_parquet(cfg.train_dataset_path)
    first_passages = {row["query"]: row["passages.passage_text"][0] for _, row in df.iterrows()}
    for query, pos, neg in data:
        assert pos == first_passages[query]


def test_error_isolation(synth_config):
    cfg = synth_config.replace(train_dataset_path="/nonexistent.parquet")
    data = TripletBuilder(cfg).load_datasets()
    assert data["train"] == []  # failed split -> [] (ref data_loader.py:113-118)
    assert len(data["validation"]) > 0


def test_accepts_raw_reference_dict(synth_config):
    raw = {
        "TRAIN_DATASET_PATH": synth_config.train_dataset_path,
        "VAL_DATASET_PATH": synth_config.val_dataset_path,
        "TEST_DATASET_PATH": synth_config.test_dataset_path,
        "NUM_TRIPLETS_PER_QUERY": 1,
        "TRAINING_MODE": "retrieval",
    }
    data = TripletBuilder(raw).load_datasets()
    assert len(data["train"]) > 0


# --- batching ---------------------------------------------------------------


@pytest.fixture
def tok():
    return Tokenizer({f"w{i}": i for i in range(100)})


def _triplets(n):
    return [(f"w{i % 50} w{(i+1) % 50}", f"w{i % 50} w{i % 50} w3", f"w{(i+7) % 50}") for i in range(n)]


def test_batcher_static_shapes(tok):
    batcher = TripletBatcher(_triplets(37), tok, batch_size=16, max_query_len=8, max_doc_len=12)
    batches = list(batcher.batches(seed=0))
    assert len(batches) == 3 == len(batcher)
    for b in batches:
        assert b.q_tokens.shape == (16, 8)
        assert b.pos_tokens.shape == (16, 12)
        assert b.neg_tokens.shape == (16, 12)
        assert b.example_mask.shape == (16,)
    # last batch: 37 - 32 = 5 real rows
    assert batches[-1].example_mask.sum() == 5
    assert batches[0].example_mask.sum() == 16


def test_batcher_shuffle_determinism(tok):
    batcher = TripletBatcher(_triplets(64), tok, batch_size=16, max_query_len=8, max_doc_len=12)
    a = [b.q_tokens for b in batcher.batches(seed=7)]
    b = [b.q_tokens for b in batcher.batches(seed=7)]
    c = [b.q_tokens for b in batcher.batches(seed=8)]
    assert all((x == y).all() for x, y in zip(a, b))
    assert any((x != y).any() for x, y in zip(a, c))


def test_batcher_covers_all_examples_once(tok):
    batcher = TripletBatcher(_triplets(40), tok, batch_size=16, max_query_len=8, max_doc_len=12)
    seen = []
    for b in batcher.batches(seed=3):
        real = b.example_mask.astype(bool)
        seen.extend(b.q_len[real].tolist())
    assert len(seen) == 40


def test_drop_remainder(tok):
    batcher = TripletBatcher(
        _triplets(37), tok, batch_size=16, max_query_len=8, max_doc_len=12, drop_remainder=True
    )
    assert len(list(batcher.batches(seed=0))) == 2


def test_tokenize_corpus_padding(tok):
    docs = [f"w{i}" for i in range(10)]
    chunks = list(tokenize_corpus(docs, tok, max_len=4, batch_size=8))
    assert len(chunks) == 2
    tokens, lengths, mask = chunks[1]
    assert tokens.shape == (8, 4)
    assert mask.sum() == 2


# --- glove ------------------------------------------------------------------


def test_parse_glove_txt(tmp_path):
    path = tmp_path / "glove.txt"
    path.write_text("the 0.1 0.2\ncat 0.3 0.4\n")
    table, w2i = parse_glove_txt(path)
    assert table.shape == (2, 2)
    assert w2i == {"the": 0, "cat": 1}
    np.testing.assert_allclose(table[1], [0.3, 0.4])


def test_load_embedding_table_unk_patch(tmp_path):
    table = np.ones((5, 4), np.float32)
    np.save(tmp_path / "emb.npy", table)
    # vocab one larger (UNK appended) -> extra small random row, seeded
    out1 = load_embedding_table(tmp_path / "emb.npy", vocab_size=6, seed=1)
    out2 = load_embedding_table(tmp_path / "emb.npy", vocab_size=6, seed=1)
    assert out1.shape == (6, 4)
    np.testing.assert_array_equal(out1, out2)
    assert np.abs(out1[5]).max() <= 0.1  # scale matches ref backend/main.py:180
    with pytest.raises(ValueError):
        load_embedding_table(tmp_path / "emb.npy", vocab_size=3)


def test_bucketed_batcher_shapes_and_coverage(tok):
    triplets = []
    rng = np.random.default_rng(0)
    for i in range(50):
        doc_len = int(rng.integers(1, 20))
        triplets.append((
            "w1 w2",
            " ".join(f"w{j % 50}" for j in range(doc_len)),
            " ".join(f"w{j % 50}" for j in range(int(rng.integers(1, 20)))),
        ))
    batcher = TripletBatcher(
        triplets, tok, batch_size=8, max_query_len=4, max_doc_len=20,
        length_buckets=[5, 10, 20],
    )
    seen = 0
    widths = set()
    for b in batcher.batches(seed=1):
        assert b.pos_tokens.shape[1] in (5, 10, 20)
        assert b.pos_tokens.shape == b.neg_tokens.shape
        widths.add(b.pos_tokens.shape[1])
        # every real row fits its bucket
        real = b.example_mask.astype(bool)
        eff = np.maximum(b.pos_len[real], b.neg_len[real])
        assert (eff <= b.pos_tokens.shape[1]).all()
        seen += int(b.example_mask.sum())
    assert seen == 50
    assert len(widths) > 1  # multiple buckets actually used
    assert len(list(batcher.batches(seed=1))) == len(batcher)


def test_bucketed_batcher_deterministic(tok):
    triplets = [(f"w{i%20}", f"w{i} " * (i % 15 + 1), "w3 w4") for i in range(40)]
    batcher = TripletBatcher(
        triplets, tok, batch_size=8, max_query_len=4, max_doc_len=16,
        length_buckets=[8, 16],
    )
    a = [(b.pos_tokens.shape, b.q_tokens.tobytes()) for b in batcher.batches(seed=5)]
    b2 = [(b.pos_tokens.shape, b.q_tokens.tobytes()) for b in batcher.batches(seed=5)]
    assert a == b2


def test_bucket_edges_always_include_max_doc_len():
    """User bucket edges beyond max_doc_len must neither drop the
    full-width bucket nor truncate documents (r2 review: edges=[256] with
    max_doc_len=128 previously produced ZERO batches)."""
    from twotowermlretrieval_tpu.data.batching import TripletBatcher
    from twotowermlretrieval_tpu.tokenizer import Tokenizer

    tok = Tokenizer({"a": 0, "b": 1, "c": 2})
    triplets = [("a b", "a b c " * 30, "b c " * 45)] * 8
    for buckets in ([256], [32, 256], [128], [32, 64], None):
        b = TripletBatcher(triplets, tok, batch_size=4, max_query_len=8,
                           max_doc_len=128, length_buckets=buckets)
        assert b.bucket_edges[-1] == 128, (buckets, b.bucket_edges)
        batches = list(b.batches(seed=0))
        assert len(batches) == 2, (buckets, len(batches))
        # the long docs (>64 tokens) ride the full-width bucket untruncated
        assert max(x.pos_tokens.shape[1] for x in batches) == 128


def test_single_query_split_does_not_hang():
    """A split reduced to ONE valid query has no cross-query negatives;
    the rejection sampler must skip the row instead of spinning forever
    (r2 review)."""
    import pandas as pd

    from twotowermlretrieval_tpu.config import Config
    from twotowermlretrieval_tpu.data.loader import TripletBuilder

    df = pd.DataFrame({
        "query": ["only query"],
        "passages": [{"passage_text": ["only passage", "another passage"]}],
    })
    for mode in ("retrieval", "ranking"):
        builder = TripletBuilder(Config(training_mode=mode))
        if mode == "ranking":
            df2 = df.copy()
            df2["passages"] = [{
                "passage_text": ["only passage", "another"],
                "is_selected": [1, 1],  # no same-query negatives either
            }]
        else:
            df2 = df
        out = builder.process_dataframe(df2, seed=42) if hasattr(builder, "process_dataframe") else None
        if out is None:
            import tempfile
            from pathlib import Path
            p = Path(tempfile.mkdtemp()) / "one.parquet"
            df2.to_parquet(p)
            out = builder.load_and_process_parquet(str(p))
        assert out == []  # skipped, not hung


def test_glove_parser_handles_multiword_tokens(tmp_path):
    """Real GloVe files (840B) contain tokens WITH spaces ('. . .'); the
    vector is the trailing D fields, not parts[1:] (r2 review)."""
    from twotowermlretrieval_tpu.data.glove import parse_glove_txt

    f = tmp_path / "glove.txt"
    f.write_text(
        "the 0.1 0.2 0.3\n"
        ". . . 0.4 0.5 0.6\n"          # token ". . ." with spaces
        "at name@domain.com 0.7 0.8 0.9\n"
        "broken 0.1 notafloat 0.3\n"   # malformed: skipped, not fatal
        "cat 1.0 1.1 1.2\n"
    )
    table, w2i = parse_glove_txt(f)
    assert table.shape == (4, 3)
    assert w2i["the"] == 0 and w2i[". . ."] == 1
    assert w2i["at name@domain.com"] == 2 and w2i["cat"] == 3
    np.testing.assert_allclose(table[1], [0.4, 0.5, 0.6])
    np.testing.assert_allclose(table[3], [1.0, 1.1, 1.2])


# ---------------------------------------------------------------------------
# inspect_data tool (ref: misc/inspect_data.ipynb; SURVEY §7 bucket edges)
# ---------------------------------------------------------------------------


def test_suggest_buckets_matches_brute_force():
    """The interval-partition DP is exactly optimal: compare its padded-token
    cost against exhaustive enumeration of cut points on random histograms."""
    import itertools

    from twotowermlretrieval_tpu.tools.inspect_data import suggest_buckets

    rng = np.random.default_rng(7)
    for trial in range(20):
        lengths = rng.integers(1, 12, size=rng.integers(5, 40)).tolist()
        k = int(rng.integers(1, 4))
        edges, waste, _ = suggest_buckets(lengths, k, max_len=64)
        ls, cs = np.unique(lengths, return_counts=True)

        def cost(edge_list):
            total, lo = 0, -1
            for e in edge_list:
                in_bucket = (ls > lo) & (ls <= e)
                total += e * cs[in_bucket].sum()
                lo = e
            return total

        # DP edges must cover everything and end at the max length
        assert edges[-1] == ls[-1] and len(edges) <= k
        dp_cost = cost(edges)
        # brute force: the last edge is pinned at ls[-1]
        m = len(ls)
        kk = min(k, m)
        best = min(
            cost([ls[i] for i in cuts] + [ls[-1]])
            for cuts in itertools.combinations(range(m - 1), kk - 1)
        ) if kk > 1 else cost([ls[-1]])
        assert dp_cost == best, (trial, edges, dp_cost, best)
        # reported waste agrees with the recomputed cost
        real = int((ls * cs).sum())
        assert waste == round((dp_cost - real) / dp_cost, 4)


def test_suggest_buckets_clips_and_degenerates():
    from twotowermlretrieval_tpu.tools.inspect_data import suggest_buckets

    # all lengths beyond max_len collapse to one bucket at max_len
    edges, waste, _ = suggest_buckets([200, 300, 400], 3, max_len=128)
    assert edges == [128] and waste == 0.0
    # k larger than distinct lengths: one bucket per length, zero waste
    edges, waste, _ = suggest_buckets([3, 3, 7, 7], 5, max_len=64)
    assert edges == [3, 7] and waste == 0.0
    assert suggest_buckets([], 3, max_len=64) == ([64], 0.0, 0.0)


def test_inspect_data_cli(synth_dir, capsys):
    """End-to-end over the synthetic corpus: split stats, embedding checks,
    and a bucket suggestion that the batcher's config accepts."""
    from twotowermlretrieval_tpu.tools.inspect_data import main

    report = main(["--data-dir", str(synth_dir), "--suggest-buckets", "2",
                   "--json"])
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])  # one JSON object
    for split in ("train", "validation", "test"):
        stats = report["splits"][split]
        assert stats["rows"] > 0 and stats["invalid_rows"] == 0
        assert stats["ranking_mode_feasible_frac"] == 1.0  # synthetic sets is_selected
        assert stats["query_token_len"]["p100"] >= stats["query_token_len"]["p50"] > 0
        assert stats["oov_rate"] == 0.0  # vocab built from the same corpus
        assert "_passage_lengths" not in stats
    emb = report["embeddings"]
    assert emb["vocab_rows_mismatch"] == 0 and emb["zero_rows_sampled"] == 0
    sug = report["bucket_suggestion"]
    assert len(sug["LENGTH_BUCKETS"]) <= 2
    assert 0.0 <= sug["padded_token_waste"] <= sug["padded_token_waste_single_bucket"]
    # the suggestion plugs straight into the batcher's config key
    from twotowermlretrieval_tpu.data.synthetic import synthetic_config

    cfg = synthetic_config(synth_dir, length_buckets=sug["LENGTH_BUCKETS"])
    assert cfg.length_buckets == sug["LENGTH_BUCKETS"]
