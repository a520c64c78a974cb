"""Multimodal column operator tests (Spark plumbing; deterministic stub codecs)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, b"\xff\xd8\xff\xe0" + b"jpegdata" * 10),
        (1, b"\x89PNG\r\n\x1a\n" + b"pngdata" * 10),
        (2, b"ID3" + b"mp3data" * 10),
        (3, b"randombytes" * 5),
        (4, None),
    ]
    return spark.createDataFrame(rows, "media_id bigint, blob binary")


class TestMetadata:
    def test_sniff_and_metadata(self, media_df):
        from i3dm_export_spark.operators import multimodal as mm

        out = {r["media_id"]: r for r in mm.media_metadata(media_df).collect()}
        assert out[0]["media_type"] == "image/jpeg"
        assert out[1]["media_type"] == "image/png"
        assert out[2]["media_type"] == "audio/mp3"
        assert out[3]["media_type"] == "application/octet-stream"
        assert out[0]["media_bytes"] == 4 + 80
        assert len(out[0]["media_md5"]) == 32


class TestDecodeFeatures:
    def test_fixed_dim_and_deterministic(self, spark, media_df):
        from i3dm_export_spark.operators import multimodal as mm

        f1 = mm.decode_image_features(media_df, dim=16).toPandas().set_index("media_id")
        f2 = mm.decode_image_features(media_df, dim=16).toPandas().set_index("media_id")
        assert all(len(v) == 16 for v in f1["features"])
        for mid in f1.index:
            np.testing.assert_array_equal(f1.loc[mid, "features"], f2.loc[mid, "features"])
        # null blob -> zero vector
        assert all(v == 0.0 for v in f1.loc[4, "features"])

    def test_features_feed_similarity_operator(self, spark, media_df):
        """The decode output plugs straight into the ANN operator —
        schema compatibility across the multimodal -> similarity seam."""
        from i3dm_export_spark.operators import multimodal as mm
        from i3dm_export_spark.operators.similarity import cosine_topk_bruteforce

        feats = mm.decode_image_features(media_df.filter("blob IS NOT NULL"), dim=16)
        feats = feats.withColumnRenamed("media_id", "vec_id").withColumnRenamed(
            "features", "embedding"
        )
        out = cosine_topk_bruteforce(feats, feats.limit(2), k=2)
        assert out.count() > 0


class TestResizeAndFrames:
    def test_resize_binary_to_binary(self, media_df):
        from i3dm_export_spark.operators import multimodal as mm

        out = mm.resize_images(media_df, 224, 224).toPandas().set_index("media_id")
        assert bytes(out.loc[0, "resized"]).startswith(b"RESIZED:224x224:")
        assert bytes(out.loc[4, "resized"]) == b""

    def test_frame_sampling_explodes_in_batch(self, media_df):
        from i3dm_export_spark.operators import multimodal as mm

        out = mm.sample_video_frames(media_df.filter("blob IS NOT NULL"), n_frames=3)
        pdf = out.toPandas()
        assert len(pdf) == 4 * 3
        assert set(pdf["frame_index"]) == {0, 1, 2}

    def test_strict_mode_raises(self, media_df):
        from i3dm_export_spark.operators import multimodal as mm

        with pytest.raises(Exception, match="NotImplementedError|codecs"):
            mm.resize_images(media_df, 8, 8, strict=True).collect()
