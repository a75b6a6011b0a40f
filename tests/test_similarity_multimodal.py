import math

import pytest
from pyspark.sql import functions as F

from fs_crawler_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)
from fs_crawler_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def py_cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_brute_force_topk_matches_python(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(emb, queries, k=5).collect()
    rows = emb.collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    for qid in (0, 1, 2):
        scored = sorted(
            (
                (round(py_cosine(vecs[qid], v), 6), -vid)
                for vid, v in vecs.items()
                if vid != qid
            ),
            reverse=True,
        )[:5]
        want = [(-nvid, c) for c, nvid in scored]
        mine = sorted(
            ((r["vec_id"], r["cos"]) for r in got if r["query_id"] == qid),
            key=lambda t: (-t[1], t[0]),
        )
        assert mine == want, f"query {qid}"


def test_ann_lsh_subset_of_bruteforce_scores(spark, emb):
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = ann_lsh_topk(emb, queries, k=3, n_planes=4)
    rows = ann.collect()
    assert len(rows) > 0
    # every ANN result must carry the exact cosine (verified re-rank)
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    for r in rows:
        assert abs(r["cos"] - round(py_cosine(vecs[r["query_id"]], vecs[r["vec_id"]]), 6)) < 1e-9


def test_embedding_near_dup_pairs_symmetric_threshold(spark, emb):
    pairs = embedding_near_dup_pairs(emb, threshold=0.8, n_planes=4).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cos"] >= 0.8


def test_multimodal_feature_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = synth_media(spark, docs, kind="video")
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram
        assert r["n_bytes"] > 0
    frames = frame_sample_plan(media, every_ms=1000)
    one = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in one)


def test_brute_force_topk_refuses_large_query_side(spark, emb):
    """The brute kernel broadcasts the query side; a query set past the
    guard must fail fast with a clear error instead of OOMing the driver."""
    import pytest

    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_query_rows"):
        brute_force_topk(emb, queries, k=3, max_query_rows=5)
    # raising the bound (or disabling) restores the old behavior
    assert brute_force_topk(emb, queries.limit(6), k=2,
                            max_query_rows=None).count() > 0
