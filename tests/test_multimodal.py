"""Multimodal plumbing: binary columns through Arrow batches, decode
stub determinism, one->many frame sampling, JVM-side payload stats."""

import pytest
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return MM.fake_assets_from_documents(read_testdata(spark, sf_dir, "documents"))


def test_asset_table_schema(assets):
    got = {f.name: f.dataType.simpleString() for f in assets.schema.fields}
    assert got["payload"] == "binary"
    assert got["asset_id"] == "bigint"


def test_decode_meta_deterministic_and_complete(assets):
    a = MM.decode_image_meta(assets).collect()
    b = MM.decode_image_meta(assets).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == assets.count()
    assert all(r["decode_ok"] for r in a)
    assert all(64 <= r["width"] < 256 and 64 <= r["height"] < 256 for r in a)


def test_decode_requires_lib_when_not_fake(assets):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MM.decode_image_meta(assets, fake=False)


def test_frame_sample_one_to_many(assets):
    frames = MM.frame_sample(assets, every_n=4, max_frames=3)
    rows = frames.collect()
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in per_asset.values())
    assert max(len(v) for v in per_asset.values()) == 3


def test_extract_features_feeds_similarity_ops(spark, sf_dir, assets):
    """Multimodal -> ANN integration: payload embeddings flow straight
    into cosine_topk; near-identical payloads (the corpus's planted
    near-dup texts) surface as top neighbors."""
    from pyspark.sql import functions as F2

    from nyc_etl_pipeline_spark.operators.similarity import cosine_topk

    emb = MM.extract_features(assets)
    rows = emb.limit(3).collect()
    assert all(len(r["embedding"]) == 64 for r in rows)
    # unit norm
    for r in rows:
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5
    queries = emb.filter(F2.col("vec_id") < 3)
    topk = cosine_topk(emb, queries, k=3)
    got = topk.collect()
    assert len(got) == 9
    assert all(r["cosine"] <= 1.0001 for r in got)
    # determinism across runs
    again = cosine_topk(MM.extract_features(assets), queries, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_payload_stats_match_text_bytes(spark, sf_dir, assets):
    docs = read_testdata(spark, sf_dir, "documents")
    stats = MM.payload_stats(assets)
    joined = stats.join(
        docs.select(F.col("doc_id").alias("asset_id"), F.octet_length("text").alias("text_bytes")),
        on="asset_id",
    )
    bad = joined.filter(F.col("n_bytes") != F.col("text_bytes")).count()
    assert bad == 0
