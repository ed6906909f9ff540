"""Multimodal plumbing: binary columns, actor-pool featurizer stage,
stub-decode determinism, and the oracle-checked byte-count invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_media_table_schema(ray_session):
    from pd3f_ray.pipelines.multimodal import media_table

    ds = media_table(SF)
    t = pa.Table.from_pandas(ds.limit(10).to_pandas())
    assert set(t.schema.names) == {
        "media_id", "kind", "payload", "width", "height",
        "sample_rate", "n_frames",
    }
    rows = ds.limit(50).to_pandas()
    assert set(rows["kind"]) <= {"image", "audio", "video"}
    # payload size rule holds on the actual bytes
    for _, r in rows.iterrows():
        assert len(r["payload"]) == 512 + (r["media_id"] % 7) * 256


def test_fake_codec_shapes():
    from pd3f_ray.pipelines.multimodal import FakeCodec

    c = FakeCodec()
    img = c.decode("image", b"\x01" * 600, 32, 32, 0, 0)
    assert img.shape == (32, 32)
    aud = c.decode("audio", b"\x02" * 600, 0, 0, 16000, 0)
    assert aud.shape == (1600,)
    vid = c.decode("video", b"\x03" * 600, 8, 8, 0, 4)
    assert vid.shape == (4, 8, 8)
    with pytest.raises(NotImplementedError):
        c.decode("hologram", b"", 0, 0, 0, 0)


def test_featurizer_transforms():
    from pd3f_ray.pipelines.multimodal import TARGET_SIZE, MediaFeaturizer

    f = MediaFeaturizer()
    img = np.arange(64 * 48, dtype=np.float32).reshape(64, 48)
    small = f.resize(img)
    assert small.shape == (TARGET_SIZE, TARGET_SIZE)
    vid = np.arange(8 * 4 * 4, dtype=np.float32).reshape(8, 4, 4)
    assert f.sample_frames(vid).shape == (4, 4, 4)


def test_media_features_deterministic(ray_session):
    from pd3f_ray.pipelines.multimodal import FEAT_DIM, media_features

    a = media_features(SF).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = media_features(SF).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(a) > 0
    assert all(len(v) == FEAT_DIM for v in a["feature"])
    for col in ("media_id", "kind", "n_bytes", "n_elements"):
        pd.testing.assert_series_equal(a[col], b[col])
    fa = np.stack([np.asarray(v) for v in a["feature"]])
    fb = np.stack([np.asarray(v) for v in b["feature"]])
    np.testing.assert_array_equal(fa, fb)


def test_media_kind_summary_oracle(ray_session):
    import os

    import duckdb

    from pd3f_ray.pipelines.multimodal import (
        MEDIA_KIND_SUMMARY_SQL,
        media_kind_summary,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    got = media_kind_summary(SF).to_pandas().sort_values("kind").reset_index(drop=True)
    want = con.execute(MEDIA_KIND_SUMMARY_SQL).df().sort_values("kind").reset_index(drop=True)
    want = want.astype(got.dtypes.to_dict(), errors="ignore")
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])
