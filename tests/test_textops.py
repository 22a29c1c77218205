"""Training-data operators: dedup family (planted near-duplicates), ANN,
langid/quality/fingerprints, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from game_review_crawler_ray.functions import hashing as H
from game_review_crawler_ray.pipelines.textops import (
    minhash_candidate_pairs, simhash_pairs,
)


BASE = ("the quick brown fox jumps over the lazy dog while the query engine "
        "scans tables and merges sorted runs across partitions with hash joins")


def _docs_with_dups() -> ray.data.Dataset:
    rows = []
    rng = np.random.default_rng(7)
    words = BASE.split()
    for i in range(40):
        shuffled = list(words)
        rng.shuffle(shuffled)
        rows.append({"doc_id": i, "text": " ".join(shuffled)})
    # planted near-duplicate pairs: (100,101) one word changed, (102,103) exact
    rows.append({"doc_id": 100, "text": BASE})
    rows.append({"doc_id": 101, "text": BASE.replace("lazy", "sleepy")})
    rows.append({"doc_id": 102, "text": BASE + " extra tail"})
    rows.append({"doc_id": 103, "text": BASE + " extra tail"})
    return ray.data.from_items(rows)


def test_minhash_lsh_finds_planted_dups():
    pairs = minhash_candidate_pairs(_docs_with_dups(), est_threshold=0.5)
    got = {(a, b) for a, b in zip(pairs.column("doc_a").to_pylist(),
                                  pairs.column("doc_b").to_pylist())}
    assert (102, 103) in got
    assert (100, 101) in got
    # exact dup estimates jaccard 1.0
    for a, b, e in zip(pairs.column("doc_a").to_pylist(),
                       pairs.column("doc_b").to_pylist(),
                       pairs.column("est_jaccard").to_pylist()):
        if (a, b) == (102, 103):
            assert e == 1.0


def test_simhash_finds_planted_dups():
    pairs = simhash_pairs(_docs_with_dups(), max_hamming=6)
    got = {(a, b) for a, b in zip(pairs.column("doc_a").to_pylist(),
                                  pairs.column("doc_b").to_pylist())}
    assert (102, 103) in got  # identical text -> hamming 0
    # simhash is order-insensitive over tokens: shuffles of BASE collide too;
    # just assert determinism + the planted pair
    pairs2 = simhash_pairs(_docs_with_dups(), max_hamming=6)
    assert pairs.equals(pairs2)


def test_hashing_kernels():
    s1 = H.minhash_signature(H.word_shingles(BASE))
    s2 = H.minhash_signature(H.word_shingles(BASE))
    assert (s1 == s2).all()
    est = H.estimate_jaccard(s1, H.minhash_signature(H.word_shingles(BASE + " x")))
    assert 0.5 < est <= 1.0
    assert H.ngram_jaccard("abcdef", "abcdef") == 1.0
    assert H.ngram_jaccard("abcdef", "uvwxyz") == 0.0
    assert H.hamming64(0b1011, 0b0011) == 1
    h = H.simhash64(BASE)
    assert 0 <= h < 2 ** 64
    assert H.simhash64(BASE) == h
    assert H.rolling_fingerprint("abc") != H.rolling_fingerprint("acb")  # order-sensitive
    chunks = H.simhash_chunks(h)
    assert len(chunks) == 4 and len(set(chunks)) == 4


def test_rolling_fingerprint_vectorized():
    """The numpy polynomial fold must reproduce the per-char Karp–Rabin
    loop exactly: golden values pinned from the pre-vectorization
    implementation, plus a random-string equivalence sweep."""
    import random

    golden = {
        "": 0,
        "a": 97,
        "ab": 97000389,
        "hello world": 2083453854010787712,
        "한국어 텍스트 처리": 1224595849175676792,
        "The quick brown fox jumps over the lazy dog. " * 40:
            570346095466824053,
        "x" * 1000: 2175243308957103929,
        "￿\U0001F600 mixed": 1923277397718113591,
    }
    for text, expect in golden.items():
        assert H.rolling_fingerprint(text) == expect, text[:30]
    rng = random.Random(7)
    for _ in range(200):
        n = rng.randrange(0, 600)
        s = "".join(chr(rng.randrange(32, 0xD700)) for _ in range(n))
        assert H.rolling_fingerprint(s) == H._rolling_fingerprint_py(s)
    # large custom bases (approaching 2^61) would overflow the no-mod
    # level-1 fold — they must route to the fully-reduced per-char path
    big_base = (1 << 61) - 129
    s = "overflow guard check " * 10
    assert H.rolling_fingerprint(s, base=big_base) == \
        H._rolling_fingerprint_py(s, big_base, (1 << 61) - 1)


def test_ann_topk_matches_bruteforce(tmp_path):
    # deterministic small embedding table
    rng = np.random.default_rng(3)
    n, d = 120, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat], pa.list_(pa.float32())),
    })
    import pyarrow.parquet as pq

    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    from game_review_crawler_ray.pipelines.textops import q_ann_topk

    got = q_ann_topk(str(tmp_path)).to_pylist()
    # driver-side exact reference
    m64 = mat.astype(np.float64)
    m64 /= np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m64[:8] @ m64[8:].T
    for qi in range(8):
        order = sorted(range(n - 8), key=lambda j: (-sims[qi, j], j + 8))[:5]
        expect = [(qi, j + 8) for j in order]
        got_q = [(r["query_id"], r["neighbor_id"]) for r in got if r["query_id"] == qi]
        assert got_q == expect


def test_embedding_neardup_lsh_matches_brute(tmp_path):
    """Planted near-dups (cos ~0.97+): the LSH-bucketed path must find the
    exact pair set and sims of the brute-force baseline."""
    import pyarrow.parquet as pq

    from game_review_crawler_ray.pipelines.textops import (
        _embeddings, embedding_neardup_brute, q_embedding_neardup,
    )

    rng = np.random.default_rng(5)
    n_base, d = 60, 32
    base = rng.normal(size=(n_base, d))
    rows, vid = [], 0
    for i in range(n_base):
        rows.append((vid, base[i])); vid += 1
        if i % 4 == 0:  # planted near-dup: tiny additive noise
            noisy = base[i] + rng.normal(scale=0.02, size=d)
            rows.append((vid, noisy)); vid += 1
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].astype(np.float32).tolist() for r in rows],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    got = q_embedding_neardup(str(tmp_path))
    brute = embedding_neardup_brute(_embeddings(str(tmp_path)), tbl)
    assert brute.num_rows >= n_base // 4  # the planted dups are really there
    assert got.num_rows == brute.num_rows
    assert got.column("vec_a").to_pylist() == brute.column("vec_a").to_pylist()
    assert got.column("vec_b").to_pylist() == brute.column("vec_b").to_pylist()
    for g, b in zip(got.column("sim").to_pylist(), brute.column("sim").to_pylist()):
        assert abs(g - b) < 1e-9

    # the SCALE verify-join (two keyed shuffles; payload_bytes=None forces
    # it) must produce the identical table as the broadcast path above
    from game_review_crawler_ray.pipelines.textops import embedding_neardup_pairs

    shuffled = embedding_neardup_pairs(_embeddings(str(tmp_path)),
                                       payload_bytes=None)
    assert shuffled.equals(got)


def test_minhash_shuffle_join_equals_broadcast():
    """dedup_minhash's size-adaptive verify-join: the reduce-side shuffle
    path (payload_bytes=None) and the broadcast path must agree exactly."""
    from game_review_crawler_ray.pipelines.textops import (
        _sig_payload_bytes, minhash_candidate_pairs_from_values, minhash_values,
    )
    from game_review_crawler_ray.pipelines.analytics import _collect

    vals = minhash_values(_docs_with_dups()).materialize()

    def run(hint):
        tbl = _collect(minhash_candidate_pairs_from_values(
            vals, est_threshold=0.5, payload_bytes=hint))
        return tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])

    a = run(_sig_payload_bytes(vals))
    b = run(None)
    assert a.num_rows > 0
    assert a.equals(b)


def test_ann_ivf_recall(tmp_path):
    """IVF probe path: recall@5 vs brute force >= 0.8 on clustered data."""
    import pyarrow.parquet as pq

    from game_review_crawler_ray.pipelines.textops import (
        q_ann_topk, q_ann_topk_ivf,
    )

    rng = np.random.default_rng(9)
    n_clusters, per, d = 10, 30, 32
    centers = rng.normal(size=(n_clusters, d)) * 3
    vecs = np.concatenate([
        centers[c] + rng.normal(size=(per, d)) for c in range(n_clusters)
    ])
    order = rng.permutation(len(vecs))
    vecs = vecs[order]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    brute = {(r["query_id"], r["neighbor_id"])
             for r in q_ann_topk(str(tmp_path)).to_pylist()}
    ivf_rows = q_ann_topk_ivf(str(tmp_path)).to_pylist()
    ivf = {(r["query_id"], r["neighbor_id"]) for r in ivf_rows}
    assert len(brute) == 8 * 5
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.8, recall
    # per-query ordering is (sim desc, neighbor asc)
    for qi in range(8):
        sims = [r["sim"] for r in ivf_rows if r["query_id"] == qi]
        assert sims == sorted(sims, reverse=True)

    # I/O-pruning contract: the query must not touch non-probed
    # partitions. Prove it behaviorally — delete every partition outside
    # the probe set and the result must be byte-identical.
    import glob
    import shutil

    from game_review_crawler_ray.pipelines.textops import (
        IVF_NPROBE, _query_matrix, ann_ivf_build, ann_ivf_probe_paths,
    )

    root, cent = ann_ivf_build(str(tmp_path))  # cached from the query above
    _, q_matn = _query_matrix(str(tmp_path))
    probes = np.argsort(-(q_matn @ cent.T), axis=1)[:, :IVF_NPROBE]
    import os

    probed = {os.path.dirname(f)
              for f in ann_ivf_probe_paths(root, probes.ravel().tolist())}
    all_parts = set(glob.glob(str(root) + "/bucket=*"))
    assert probed <= all_parts and probed  # probe paths are real partitions
    if all_parts - probed:                 # some partitions are NOT probed
        for p in all_parts - probed:
            shutil.rmtree(p)
        again = {(r["query_id"], r["neighbor_id"], r["sim"])
                 for r in q_ann_topk_ivf(str(tmp_path)).to_pylist()}
        assert again == {(r["query_id"], r["neighbor_id"], r["sim"])
                         for r in ivf_rows}


def test_media_features_plumbing():
    from game_review_crawler_ray.stages.multimodal import (
        FakeDecoder, RealDecoder, gen_media, media_features,
    )

    with pytest.raises(NotImplementedError):
        RealDecoder()
    media = gen_media(50, seed=1)
    assert media.column_names == ["media_id", "kind", "payload", "width",
                                  "height", "sample_rate"]
    out = media_features(media, concurrency=2, batch_size=16)
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    assert tbl.num_rows == 50
    assert "payload" not in tbl.column_names      # wide binary dropped
    feats = tbl.column("feature").to_pylist()
    assert all(len(f) == 16 for f in feats)
    assert all(abs(sum(f) - 1.0) < 1e-5 for f in feats)  # histogram normalized
    # determinism
    tbl2 = pa.concat_tables(ray.get(
        media_features(gen_media(50, seed=1), concurrency=2, batch_size=16)
        .to_arrow_refs()))
    assert tbl.sort_by("media_id").equals(tbl2.sort_by("media_id"))


def test_langid_and_quality_formulas(tmp_path):
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["hello world this is english text",
                          "안녕하세요 한국어 문서입니다 반갑습니다",
                          "12345 67890 ...",
                          ""], pa.string()),
        "lang": pa.array(["en", "ko", "x", "x"], pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([1, 1, 1, 1], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    from game_review_crawler_ray.pipelines.textops import q_langid, q_quality_scores

    pred = dict(zip(q_langid(str(tmp_path)).column("doc_id").to_pylist(),
                    q_langid(str(tmp_path)).column("pred_lang").to_pylist()))
    assert pred == {0: "en", 1: "ko", 2: "other", 3: "unknown"}
    q = q_quality_scores(str(tmp_path)).to_pylist()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)
