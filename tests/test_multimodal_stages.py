"""Frame-sampling and resize multimodal stages (stub decode boundary,
real one-to-many expansion / byte-sized plumbing)."""

import pyarrow as pa
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a" * 1000, "b" * 100]),
    }))


def test_frame_sampling_grid(docs_ds):
    from verify_ray.pipelines.multimodal import media_frames

    df = media_frames(docs_ds, frame_bytes=256, every=4).to_pandas()
    g1 = df[df.doc_id == 1].sort_values("frame_idx")
    # 1000 bytes -> 4 frames (0..3), sampled every 4th -> frame 0 only
    assert list(g1.frame_idx) == [0]
    assert list(g1.frame_n_bytes) == [256]
    g2 = df[df.doc_id == 2]
    assert list(g2.frame_idx) == [0]
    assert list(g2.frame_n_bytes) == [100]  # short payload: partial frame


def test_frame_sampling_every_1(docs_ds):
    from verify_ray.pipelines.multimodal import media_frames

    df = media_frames(docs_ds, frame_bytes=256, every=1).to_pandas()
    g1 = df[df.doc_id == 1].sort_values("frame_idx")
    assert list(g1.frame_idx) == [0, 1, 2, 3]
    assert list(g1.frame_n_bytes) == [256, 256, 256, 232]
    # checksums of identical frames agree (frames 0..2 are all 'a'*256)
    assert len(set(g1.frame_checksum.iloc[:3])) == 1


def test_resize_truncate_and_pad(docs_ds):
    from verify_ray.pipelines.multimodal import media_resized

    df = media_resized(docs_ds, target_bytes=512).to_pandas()
    assert set(df.n_bytes) == {512}
    by_id = df.set_index("doc_id")["payload"]
    assert by_id[1] == b"a" * 512               # truncated
    assert by_id[2] == b"b" * 100 + b"\x00" * 412  # padded
