"""Training-data operator tests: dedup (exact / minhash / simhash),
similarity search, text analysis."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from hypertrace_ingester_ray.stages import dedup, similarity, text_analysis


@pytest.fixture(scope="module")
def docs(ray_session):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "a completely different document about data processing engines at scale",
        "the quick brown fox jumps over the lazy dog and runs far away tonight",
        "short text",
        "a completely different document about data processing engines at scale",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(base))), pa.int64()),
            "text": pa.array(base, pa.string()),
        }
    )
    return ray.data.from_arrow(t)


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, num_partitions=4).to_pandas()
    assert len(out) == 4  # docs 1 and 4 are identical
    dup = out[out.n_copies == 2]
    assert len(dup) == 1 and dup.iloc[0].doc_id == 1


def test_minhash_finds_near_dups(docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, sim_threshold=0.35, num_partitions=4
    ).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert (0, 2) in got  # one-word difference
    assert (1, 4) in got  # identical
    assert (0, 1) not in got and (0, 3) not in got


def test_exact_jaccard():
    assert dedup.exact_jaccard("a b c d", "a b c d") == 1.0
    assert dedup.exact_jaccard("a b c d", "x y z w") == 0.0


def test_simhash_identical_docs(docs):
    pairs = dedup.simhash_pairs(docs, max_hamming=3, num_partitions=4).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert (1, 4) in got  # identical docs have hamming 0


def test_knn_matches_numpy_bruteforce(ray_session):
    rng = np.random.default_rng(0)
    n, d, q, k = 200, 16, 3, 5
    mat = rng.normal(size=(n, d))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1).astype(np.float32)), d
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    qids = np.arange(q)
    out = similarity.knn_bruteforce(
        ds, qids, mat[:q].astype(np.float32), k=k
    ).to_pandas()

    # reference: plain numpy in float64 from the same float32 inputs
    m32 = mat.astype(np.float32).astype(np.float64)
    norm = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sim = norm[:q] @ norm.T
    for qi in range(q):
        s = sim[qi].copy()
        s[qi] = -np.inf
        expect = np.argsort(-s, kind="stable")[:k]
        got = out[out.query_id == qi].sort_values("rank").neighbor_id.to_numpy()
        assert got.tolist() == expect.tolist()


def test_ivf_search_recalls_bruteforce(ray_session):
    rng = np.random.default_rng(1)
    n, d = 300, 8
    # clustered data so IVF probing is meaningful
    centers = rng.normal(size=(3, d)) * 5
    mat = np.vstack([centers[i % 3] + rng.normal(size=d) * 0.1 for i in range(n)])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1).astype(np.float32)), d
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    indexed = similarity.ivf_assign(ds, centers).materialize()
    out = similarity.ivf_search(
        indexed, np.array([0]), mat[:1], centers, k=5, nprobe=1
    ).to_pandas()
    assert len(out) == 5
    # all neighbors should share query 0's cluster (ids ≡ 0 mod 3)
    assert (out.neighbor_id % 3 == 0).all()


def test_token_stats(docs):
    out = text_analysis.token_stats(docs).to_pandas().sort_values("doc_id")
    assert out.iloc[3].n_tokens == 2
    assert out.iloc[3].n_chars == len("short text")


def test_lang_id_stopwords(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["the cat and the dog of the house",
                 "el gato y la casa de que",
                 "xyzzy plugh"],
                pa.string(),
            ),
        }
    )
    out = text_analysis.lang_id(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out.pred_lang.tolist() == ["en", "es", "unknown"]


def test_fingerprint_deterministic(docs):
    a = text_analysis.fingerprints(docs).to_pandas().sort_values("doc_id")
    b = text_analysis.fingerprints(docs).to_pandas().sort_values("doc_id")
    assert a.fingerprint.tolist() == b.fingerprint.tolist()
    # identical docs → identical fingerprints
    assert a.iloc[1].fingerprint == a.iloc[4].fingerprint


def test_embedding_lsh_near_dup_recall(ray_session):
    """LSH-blocked near-dup must recover (nearly) all pairs the exact
    label-blocked variant finds within labels, plus it may add cross-label
    pairs the label blocking cannot see."""
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = dedup.embedding_near_dup(
        ds, threshold=0.30, num_partitions=4
    ).to_pandas()
    lsh = dedup.embedding_near_dup_lsh(
        ds, threshold=0.30, nbits=3, n_tables=16, num_partitions=4
    ).to_pandas()
    ex = set(map(tuple, exact[["id_a", "id_b"]].values))
    ls = set(map(tuple, lsh[["id_a", "id_b"]].values))
    if ex:
        recall = len(ex & ls) / len(ex)
        assert recall >= 0.8, recall


def test_hopping_window_counts(ray_session):
    """Every row lands in window/hop overlapping windows; totals add up."""
    import pyarrow as pa
    import ray.data

    from hypertrace_ingester_ray.stages.metrics import hopping_window_counts

    t = pa.table(
        {
            "ts": pa.array([0, 10, 25, 100], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "b", "a"], pa.string()),
        }
    )
    out = hopping_window_counts(
        ray.data.from_arrow(t), window_us=40, hop_us=10
    ).to_pandas()
    # each of 4 rows → 4 windows; sum of counts = 16
    assert out.num_events.sum() == 16
    # window starting at t=0 contains rows at ts 0,10,25 → a:2, b:1
    w0 = out[out.window_start.astype("int64") == 0]
    assert dict(zip(w0.event_type, w0.num_events)) == {"a": 2, "b": 1}


def test_bm25_topk_integer_exact(ray_session):
    """Scores match a hand-rolled Python mirror of the integer formula;
    ranking ties break by doc_id; docs with no query term never appear."""
    texts = ["x x y", "x z z z", "y y", "w w w w"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(4)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = text_analysis.bm25_topk(
        ray.data.from_arrow(t), {7: ["x", "y"]}, k=3
    ).to_pandas()
    # hand mirror
    toks = [s.split(" ") for s in texts]
    N, T = 4, sum(len(ts) for ts in toks)
    df = {"x": 2, "y": 2}
    exp = {}
    for d, ts in enumerate(toks):
        score = 0
        L100 = len(ts) * N * 100 // T
        X = 25 + (75 * L100) // 100
        for term in ("x", "y"):
            tf = ts.count(term)
            if tf == 0:
                continue
            idf = N * 10**6 // (df[term] + 1)
            den = tf * 100 + (120 * X) // 100
            score += idf * (tf * 220 * 1000 // den)
        if score:
            exp[d] = score
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(out.doc_id) == [d for d, _ in ranked]
    assert list(out.score) == [s for _, s in ranked]
    assert list(out["rank"]) == [1, 2, 3]
    assert 3 not in set(out.doc_id)  # "w w w w" has no query term


def test_bpe_token_counts(ray_session):
    """BPE-ish piece counts: contractions split, letter/digit/punct runs are
    one piece each, CJK counts per run — whitespace counts stay word-level."""
    texts = ["it's 2026, really?!", "你好 world", ""]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        text_analysis.bpe_token_counts(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # "it's 2026, really?!" -> it | 's | " 2026" | "," | " really" | "?!"
    assert out.loc[0, "n_bpe_tokens"] == 6 and out.loc[0, "n_ws_tokens"] == 3
    # "你好 world" -> 你好 | " world"
    assert out.loc[1, "n_bpe_tokens"] == 2 and out.loc[1, "n_ws_tokens"] == 2
    assert out.loc[2, "n_bpe_tokens"] == 0 and out.loc[2, "n_ws_tokens"] == 1


def test_unigram_surprisal_exact(ray_session):
    """Integer mean-inverse-frequency scores match a hand Python mirror,
    including the empty-token edge (single empty-string token)."""
    texts = ["a a b", "b c", "a", ""]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        text_analysis.unigram_surprisal(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # corpus tokens: a a b | b c | a | '' -> counts a:3 b:2 c:1 '':1, total 7
    cnt = {"a": 3, "b": 2, "c": 1, "": 1}
    total, scale = 7, 10**6
    for i, txt in enumerate(texts):
        toks = txt.split(" ")
        exp = sum(total * scale // cnt[w] for w in toks) // len(toks)
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "rarity_x1e6"] == exp


def test_verified_near_dup_pairs(ray_session):
    """LSH candidates + exact jaccard verification: dup docs pair up with
    jaccard 1000, dissimilar docs never appear."""
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",   # dup of 0
                    "the quick brown fox jumps over a lazy dog",     # near-dup
                    "completely different words entirely here now",
                    "another unrelated document with other tokens",
                    "the quick brown fox jumps over the lazy dog",   # dup of 0
                ],
                pa.string(),
            ),
        }
    )
    out = dedup.verified_near_dup_pairs(
        ray.data.from_arrow(t), num_partitions=4
    ).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].values))
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    exact = out.set_index(["doc_a", "doc_b"]).jaccard_x1000
    assert exact.loc[(0, 1)] == 1000
    assert all((a, b) not in pairs for a in (3,) for b in (4,))


def test_media_real_bmp_decode(ray_session):
    """BMP payloads go through the REAL pure-numpy decode: features are
    actual per-channel means, not the stub hash."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hypertrace_ingester_ray.stages import multimodal as mm

    px = np.full((8, 8, 3), 128, dtype=np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([mm.encode_bmp(px)], pa.binary()),
            "mime": pa.array(["image/bmp"], pa.string()),
            "width": pa.array([8], pa.int32()),
            "height": pa.array([8], pa.int32()),
        }
    )
    out = mm.extract_media_features(
        ray.data.from_arrow(t), batch_size=4, concurrency=1
    ).to_pandas()
    feat = np.asarray(out.feature.iloc[0])
    assert abs(feat[0] - 128 / 255) < 1e-6  # real channel mean
    assert abs(feat[3]) < 1e-6  # constant image → zero std


def test_pair_dedup_huge_doc_ids(ray_session):
    """doc ids above 2^32 must dedup correctly — the pair-key passes dedup on
    the (doc_a, doc_b) columns directly, with no packed int64 key that could
    silently collide (VERDICT r2 #1)."""
    import ray.data
    from hypertrace_ingester_ray.stages import dedup

    base = 1 << 40  # far beyond the old 32-bit packing range
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about distributed dataflow systems",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([base + 1, base + 2, base + 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    pairs = dedup.minhash_lsh_pairs(ds, num_partitions=4).to_pandas()
    assert len(pairs) == 1
    assert pairs.iloc[0]["doc_a"] == base + 1
    assert pairs.iloc[0]["doc_b"] == base + 2


def test_connected_components_path_and_clique(ray_session):
    # path 1-2-3-4 (diameter 3, needs >1 propagation round) + clique 10-12
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 3, 10, 10, 11], pa.int64()),
                "doc_b": pa.array([2, 3, 4, 11, 12, 12], pa.int64()),
            }
        )
    )
    out = (
        dedup.connected_components(pairs, num_partitions=4)
        .to_pandas()
        .sort_values("node")
    )
    assert list(out.node) == [1, 2, 3, 4, 10, 11, 12]
    assert list(out.component_id) == [1, 1, 1, 1, 10, 10, 10]


def test_connected_components_unconverged_raises(ray_session):
    # a 5-hop path cannot converge in 1 round
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "doc_b": pa.array([2, 3, 4, 5, 6], pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iters=1, num_partitions=4)


def test_canonical_docs_keeps_one_per_component(ray_session):
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 10], pa.int64()),
                "doc_b": pa.array([2, 3, 11], pa.int64()),
            }
        )
    )
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 10, 11, 99], pa.int64()),
                "text": pa.array(["t"] * 6, pa.string()),
            }
        )
    )
    kept = (
        dedup.canonical_docs(docs, pairs, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    # min-id per component {1,2,3}->1, {10,11}->10; singleton 99 survives
    assert list(kept.doc_id) == [1, 10, 99]
    assert list(kept.columns) == ["doc_id", "text"]


def test_kmeans_separated_clusters(ray_session):
    # three tight blobs far apart -> k-means with k=3 recovers them exactly
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    vecs, truth = [], []
    for ci, c in enumerate(centers):
        pts = c + rng.normal(0, 0.5, size=(20, 2))
        vecs.extend(pts.tolist())
        truth.extend([ci] * 20)
    # interleave ids across blobs: the deterministic init (3 lowest ids)
    # then seeds one centroid per blob — Lloyd's recovers them exactly
    # (all-in-one-blob init converges to a legitimate local optimum instead)
    perm = [(j % 3) * 20 + j // 3 for j in range(60)]
    t = pa.table(
        {
            "vec_id": pa.array(list(range(60)), pa.int64()),
            "embedding": pa.array([vecs[i] for i in perm]),
        }
    )
    truth = [truth[i] for i in perm]
    out = (
        similarity.kmeans(ray.data.from_arrow(t), k=3, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # each true blob maps to exactly one predicted cluster
    for ci in range(3):
        pred = set(out.cluster[np.array(truth) == ci])
        assert len(pred) == 1, (ci, pred)


def test_kmeans_deterministic_and_partition_invariant(ray_session):
    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "vec_id": pa.array(list(range(80)), pa.int64()),
            "embedding": pa.array(rng.normal(size=(80, 8)).tolist()),
        }
    )
    a = (
        similarity.kmeans(ray.data.from_arrow(t), k=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        similarity.kmeans(ray.data.from_arrow(t).repartition(7), k=4, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(a.cluster) == list(b.cluster)
    assert set(a.columns) == {"vec_id", "cluster"}


def test_semantic_dedup_pairs(ray_session):
    # two tight blobs: within-blob pairs are near-dups, cross-blob are not
    rng = np.random.default_rng(11)
    a = rng.normal(0, 0.01, size=(6, 4)) + np.array([1.0, 0, 0, 0])
    b = rng.normal(0, 0.01, size=(6, 4)) + np.array([0, 1.0, 0, 0])
    vecs = np.empty((12, 4))
    vecs[0::2], vecs[1::2] = a, b  # interleave so init spans blobs
    t = pa.table(
        {
            "vec_id": pa.array(list(range(12)), pa.int64()),
            "embedding": pa.array(vecs.tolist()),
        }
    )
    out = dedup.semantic_dedup_pairs(
        ray.data.from_arrow(t), k=2, iters=2, threshold=0.99, num_partitions=4
    ).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values))
    evens = [i for i in range(12) if i % 2 == 0]
    odds = [i for i in range(12) if i % 2 == 1]
    import itertools

    expect = set(itertools.combinations(evens, 2)) | set(
        itertools.combinations(odds, 2)
    )
    assert got == expect  # all within-blob pairs, no cross-blob pair


def test_random_projection_jl(ray_session):
    """Deterministic across partitioning; pairwise distances preserved
    within JL tolerance at k=64."""
    rng = np.random.RandomState(3)
    n, d = 60, 128
    m = rng.randn(n, d).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float32()), d
            ),
        }
    )
    def run(parts):
        out = (
            similarity.random_projection(
                ray.data.from_arrow(t).repartition(parts), out_dim=64
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        return np.stack(out.embedding_rp.to_numpy())
    a, b = run(1), run(5)
    assert np.array_equal(a, b)  # partitioning-invariant
    # JL distance preservation: sampled pair distances within 40% (loose
    # bound at k=64, deterministic seed)
    for i, j in [(0, 1), (5, 40), (17, 59), (3, 30)]:
        orig = np.linalg.norm(m[i] - m[j])
        proj = np.linalg.norm(a[i] - a[j])
        assert abs(proj - orig) / orig < 0.4, (i, j, orig, proj)


def test_bm25_topk_null_and_empty_text(ray_session):
    """Null/empty text rows — including as the LAST rows of the batch, which
    used to push len(flat) into reduceat's index list (ADVICE r3) — score 0
    and never appear; other docs are unaffected."""
    t = pa.table(
        {
            "doc_id": pa.array(list(range(5)), pa.int64()),
            "text": pa.array(["x x y", None, "y y", None, ""], pa.string()),
        }
    )
    out = text_analysis.bm25_topk(
        ray.data.from_arrow(t), {1: ["x", "y"]}, k=5
    ).to_pandas()
    assert set(out.doc_id) == {0, 2}
    assert (out.score > 0).all()
    # a batch whose docs are ALL null is also fine
    t2 = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([None, None], pa.string()),
        }
    )
    out2 = text_analysis.bm25_topk(
        ray.data.from_arrow(t2), {1: ["x"]}, k=3
    )
    assert out2.num_rows == 0


def test_tfidf_vocab_join_identical_to_broadcast(ray_session):
    """The word-keyed shuffle-join path (vocab='join', unbounded
    vocabulary) produces row-identical output to the broadcast path for
    tfidf_top_terms, unigram_surprisal and bigram_pmi; the broadcast
    driver-collect guard raises loudly when the vocabulary exceeds
    max_distinct (VERDICT r3 #3)."""
    import numpy as np

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(3, 25)).tolist())
        for _ in range(80)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(80)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)

    def _sorted(d, cols):
        return (
            d.to_pandas().sort_values(cols).reset_index(drop=True)
        )

    a = _sorted(
        text_analysis.tfidf_top_terms(ds, k=3), ["doc_id", "rank"]
    )
    b = _sorted(
        text_analysis.tfidf_top_terms(ds, k=3, vocab="join", num_partitions=4),
        ["doc_id", "rank"],
    )
    assert a.equals(b), (len(a), len(b))

    a = _sorted(text_analysis.unigram_surprisal(ds), ["doc_id"])
    b = _sorted(
        text_analysis.unigram_surprisal(ds, vocab="join", num_partitions=4),
        ["doc_id"],
    )
    assert a.equals(b), (len(a), len(b))

    a = text_analysis.bigram_pmi(ds, k=10).to_pandas()
    b = text_analysis.bigram_pmi(
        ds, k=10, vocab="join", num_partitions=4
    ).to_pandas()
    assert a.equals(b), (len(a), len(b))

    # loud guards on the broadcast driver collect
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_distinct"):
        text_analysis.tfidf_top_terms(ds, k=3, max_distinct=10).materialize()
    with _pytest.raises(ValueError, match="max_distinct"):
        text_analysis.unigram_surprisal(ds, max_distinct=10).materialize()
    with _pytest.raises(ValueError, match="max_distinct"):
        text_analysis.bigram_pmi(ds, k=5, max_distinct=3).materialize()


def test_tfidf_join_path_null_and_empty_docs(ray_session):
    """vocab='join' keeps zero-token docs in unigram_surprisal output
    (rarity 0), matching broadcast."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["x x y", None, "y z"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    a = (
        text_analysis.unigram_surprisal(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        text_analysis.unigram_surprisal(ds, vocab="join", num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert set(b.doc_id) == {0, 1, 2}
    assert b.set_index("doc_id").loc[1, "rarity_x1e6"] == 0


def _vec_table(mat: np.ndarray) -> pa.Table:
    n, d = mat.shape
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1).astype(np.float32)), d
            ),
        }
    )


def test_pq_exact_when_codebook_covers_corpus(ray_session):
    # every vector is one of 4 distinct prototypes -> with k=4 centroids per
    # subspace the quantization is LOSSLESS, so ADC ranking must equal the
    # exact cosine ranking from knn_bruteforce
    rng = np.random.default_rng(1)
    protos = rng.normal(size=(4, 8))
    labels = rng.integers(0, 4, size=120)
    mat = protos[labels]
    ds = ray.data.from_arrow(_vec_table(mat)).repartition(4)
    books = similarity.pq_train(ds, m=4, k=4, iters=4, sample=120)
    assert books.shape == (4, 4, 2)
    encoded = similarity.pq_encode(ds, books)
    enc = encoded.to_pandas().sort_values("vec_id")
    codes = np.stack(enc.pq_code.to_numpy())
    assert codes.dtype == np.uint8 and codes.shape == (120, 4)
    # lossless: same prototype -> same code row
    for lab in range(4):
        rows = codes[labels == lab]
        assert (rows == rows[0]).all()
    qids = np.arange(3)
    out = similarity.pq_search(encoded, books, qids, mat[:3], k=5).to_pandas()
    brute = similarity.knn_bruteforce(
        ds, qids, mat[:3].astype(np.float32), k=5
    ).to_pandas()
    for qi in range(3):
        got = set(out[out.query_id == qi].neighbor_id)
        # ADC distances tie across a whole prototype class; compare the
        # NEIGHBOR SET by class, which losslessness makes exact
        want_lab = {labels[n] for n in brute[brute.query_id == qi].neighbor_id}
        got_lab = {labels[n] for n in got}
        assert got_lab == want_lab
        assert len(got) == 5


def test_pq_deterministic_and_approximates_bruteforce(ray_session):
    rng = np.random.default_rng(2)
    # clustered corpus (ANN's design regime): 8 clusters, small noise
    centers = rng.normal(size=(8, 16)) * 3
    labels = rng.integers(0, 8, size=400)
    mat = centers[labels] + rng.normal(size=(400, 16)) * 0.05
    ds = ray.data.from_arrow(_vec_table(mat)).repartition(3)
    books1 = similarity.pq_train(ds, m=4, k=16, iters=3, sample=256)
    books2 = similarity.pq_train(ds, m=4, k=16, iters=3, sample=256)
    assert np.array_equal(books1, books2)  # deterministic
    encoded = similarity.pq_encode(ds, books1)
    qids = np.arange(5)
    out = similarity.pq_search(encoded, books1, qids, mat[:5], k=10).to_pandas()
    brute = similarity.knn_bruteforce(
        ds, qids, mat[:5].astype(np.float32), k=10
    ).to_pandas()
    # PQ's quantization error (~centroid spacing) exceeds the 0.05
    # within-cluster noise, so ranking WITHIN a cluster is beyond its
    # resolution by design — the ANN property PQ must deliver is
    # CLUSTER-level retrieval: neighbors come from the query's cluster
    same_cluster = []
    for qi in range(5):
        got = out[out.query_id == qi].neighbor_id.to_numpy()
        same_cluster.append(np.mean(labels[got] == labels[qi]))
    assert np.mean(same_cluster) >= 0.9
    # and brute-force agrees that's the right cluster (sanity)
    b0 = brute[brute.query_id == 0].neighbor_id.to_numpy()
    assert (labels[b0] == labels[0]).all()
    # rank output contract
    r = out[out.query_id == 0].sort_values("rank")
    assert list(r["rank"]) == list(range(1, 11))
    assert (np.diff(r.adc_d2) >= -1e-12).all()


def test_pq_dim_not_divisible_raises(ray_session):
    mat = np.random.default_rng(3).normal(size=(20, 6))
    ds = ray.data.from_arrow(_vec_table(mat))
    with pytest.raises(ValueError, match="dim % m"):
        similarity.pq_train(ds, m=4, k=4, sample=20)


def test_ivfpq_search_composed_index(ray_session):
    rng = np.random.default_rng(4)
    centers = rng.normal(size=(6, 16)) * 3
    labels = rng.integers(0, 6, size=300)
    mat = centers[labels] + rng.normal(size=(300, 16)) * 0.05
    ds = ray.data.from_arrow(_vec_table(mat)).repartition(3)
    centroids = similarity.deterministic_centroids(ds, 12)
    books = similarity.pq_train(ds, m=4, k=16, iters=3, sample=256)
    index = similarity.pq_encode(
        similarity.ivf_assign(ds, centroids), books, keep_cols=["ivf_bucket"]
    )
    assert set(index.schema().names) == {"vec_id", "ivf_bucket", "pq_code"}
    out = similarity.ivfpq_search(
        index, books, centroids, np.arange(4), mat[:4], k=5, nprobe=4
    ).to_pandas()
    assert len(out) == 20
    # composed approximation still retrieves the query's own cluster
    same = [
        np.mean(labels[out[out.query_id == qi].neighbor_id.to_numpy()] == labels[qi])
        for qi in range(4)
    ]
    assert np.mean(same) >= 0.8
