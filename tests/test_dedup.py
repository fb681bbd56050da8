"""AllPairs prefix-filter exact similarity join (stages/dedup.py) vs
brute-force ground truth."""

import numpy as np



def test_allpairs_jaccard_exact_vs_bruteforce(ray_session):
    """Prefix-filter AllPairs join == brute-force O(n^2) word-set Jaccard:
    recall 1.0 (exactness), precision 1.0 (verification), across partition
    counts and thresholds."""
    import itertools

    import pyarrow as pa
    import ray.data

    from hypertrace_ingester_ray.stages.dedup import allpairs_jaccard_pairs

    rng = np.random.RandomState(41)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(60):
        k = rng.randint(3, 12)
        words = list(rng.choice(vocab, size=k, replace=False))
        texts.append(" ".join(words))
        ids.append(i)
        if rng.rand() < 0.3:  # planted near-dup: drop/add one word
            w2 = words[:-1] + [str(rng.choice(vocab))]
            texts.append(" ".join(w2))
            ids.append(100 + i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    def brute(th):
        sets = {i: set(s.split(" ")) for i, s in zip(ids, texts)}
        out = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union if union else 1.0
            if j >= th:
                out.add((a, b))
        return out

    for th, nparts in ((0.5, 4), (0.7, 9)):
        got = allpairs_jaccard_pairs(
            ray.data.from_arrow(t), threshold=th, num_partitions=nparts
        ).to_pandas()
        pairs = set(zip(got["doc_a"].tolist(), got["doc_b"].tolist()))
        assert pairs == brute(th), (th, nparts,
                                    pairs - brute(th), brute(th) - pairs)


def test_allpairs_bucket_cap_raises(ray_session):
    """A token bucket exceeding bucket_cap must raise loudly, not degrade."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from hypertrace_ingester_ray.stages.dedup import allpairs_jaccard_pairs

    t = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": ["same same same"] * 30,
        }
    )
    with _pytest.raises(Exception, match="bucket_cap"):
        allpairs_jaccard_pairs(
            ray.data.from_arrow(t), threshold=0.5,
            num_partitions=2, bucket_cap=10,
        ).materialize()


def test_substring_overlap_pairs_vs_bruteforce(ray_session):
    """substring_overlap_pairs == brute-force distinct shared k-gram counts;
    short docs emit nothing; pairs are a<b; partition-count invariant."""
    import itertools

    import pyarrow as pa
    import ray.data

    from hypertrace_ingester_ray.stages.dedup import substring_overlap_pairs

    rng = np.random.RandomState(17)
    alpha = "abcdefgh"
    texts, ids = [], []
    for i in range(40):
        s = "".join(rng.choice(list(alpha), size=rng.randint(5, 60)))
        texts.append(s)
        ids.append(i)
        if rng.rand() < 0.4:  # planted overlap: copy a slice into a new doc
            j = rng.randint(0, max(len(s) - 15, 1))
            texts.append(
                "".join(rng.choice(list(alpha), size=10)) + s[j : j + 15]
            )
            ids.append(100 + i)
    k = 8
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    def grams(s):
        return {s[i : i + k] for i in range(len(s) - k + 1)}

    gsets = {i: grams(s) for i, s in zip(ids, texts)}
    exp = {}
    for a, b in itertools.combinations(sorted(gsets), 2):
        shared = len(gsets[a] & gsets[b])
        if shared:
            exp[(a, b)] = shared

    for nparts in (3, 7):
        got = substring_overlap_pairs(
            ray.data.from_arrow(t), k=k, num_partitions=nparts
        ).to_pandas()
        m = {
            (r.doc_a, r.doc_b): r.n_shared for r in got.itertuples()
        }
        assert m == exp, (nparts, len(m), len(exp))


def test_winnow_guarantee_and_density(ray_session):
    """Winnowing guarantee: every pair sharing a substring of length
    >= w+k-1 is detected; fingerprint density ~2/(w+1) (< 3/(w+1) slack);
    winnow pairs are a subset of full substring-overlap pairs."""
    import pyarrow as pa
    import ray.data

    from hypertrace_ingester_ray.stages.dedup import (
        substring_overlap_pairs,
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    rng = np.random.RandomState(9)
    alpha = list("abcdefghijklmnop")
    k, w = 8, 4
    clone = "".join(rng.choice(alpha, size=k + w - 1))  # exactly the floor
    texts, ids, planted = [], [], []
    for i in range(30):
        s = "".join(rng.choice(alpha, size=rng.randint(40, 120)))
        texts.append(s)
        ids.append(i)
        if rng.rand() < 0.5:
            j = rng.randint(0, 20)
            texts.append(
                "".join(rng.choice(alpha, size=j)) + clone
                + "".join(rng.choice(alpha, size=20))
            )
            ids.append(100 + i)
            planted.append(100 + i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)

    got = winnow_overlap_pairs(ds, k=k, w=w, num_partitions=3).to_pandas()
    pairs = set(zip(got["doc_a"].tolist(), got["doc_b"].tolist()))
    # guarantee: every planted pair of clone carriers is found
    for i, a in enumerate(planted):
        for b in planted[i + 1:]:
            assert (min(a, b), max(a, b)) in pairs, (a, b)
    # soundness: winnow pairs share >= 1 true k-gram (subset of exact op)
    full = substring_overlap_pairs(ds, k=k, num_partitions=3).to_pandas()
    full_pairs = set(zip(full["doc_a"].tolist(), full["doc_b"].tolist()))
    assert pairs <= full_pairs
    # density: |fingerprints| well below |grams| (expected ~2/(w+1))
    fp = winnow_fingerprints(ds, k=k, w=w).to_pandas()
    n_grams = sum(max(len(s) - k + 1, 0) for s in texts)
    assert len(fp) < n_grams * 3.0 / (w + 1), (len(fp), n_grams)


def test_duplicated_span_stats_vs_bruteforce(ray_session):
    """duplicated_span_stats == brute-force per-doc union of positions
    covered by k-grams shared with another doc; partition invariant."""
    import pyarrow as pa
    import ray.data

    from hypertrace_ingester_ray.stages.dedup import duplicated_span_stats

    rng = np.random.RandomState(21)
    alpha = list("abcdef")
    k = 6
    texts, ids = [], []
    shared_chunk = "".join(rng.choice(alpha, size=25))
    for i in range(30):
        s = "".join(rng.choice(alpha, size=rng.randint(10, 80)))
        if rng.rand() < 0.5:
            j = rng.randint(0, len(s))
            s = s[:j] + shared_chunk + s[j:]
        texts.append(s)
        ids.append(i)

    def brute():
        grams = {}
        for i, s in zip(ids, texts):
            for p in range(len(s) - k + 1):
                grams.setdefault(s[p : p + k], set()).add(i)
        out = {}
        for i, s in zip(ids, texts):
            covered = set()
            for p in range(len(s) - k + 1):
                g = s[p : p + k]
                if len(grams[g]) > 1:
                    covered.update(range(p, p + k))
            if covered:
                out[i] = len(covered)
        return out

    exp = brute()
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    for nparts in (2, 5):
        got = duplicated_span_stats(
            ray.data.from_arrow(t), k=k, num_partitions=nparts
        ).to_pandas()
        m = dict(zip(got["doc_id"].tolist(), got["dup_chars"].tolist()))
        assert m == exp, (nparts, len(m), len(exp))
