"""Packed shard format: pack -> native/numpy readers agree with the source."""
import numpy as np
import pytest

from subgc_tpu.data.packed import PackedShard, PackedSpec, pack_image, \
    write_shard
from subgc_tpu.data.synthetic import generate_dataset
from subgc_tpu.io.sg_npz import SGDir


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed")
    man = generate_dataset(str(root / "d"), n_images=6, seed=17)
    spec = PackedSpec(feat_dim=man["feat_dim"],
                      n_obj_cls=man["n_obj_classes"],
                      n_rel_cls=man["n_rel_classes"], max_subg=16)
    sg = SGDir(man["sg_dir"])
    masks = SGDir(man["mask_dir"])
    import json
    images = json.load(open(man["input_json"]))["images"]
    recs = [pack_image(spec, img["id"], sg.get(img["id"]),
                       masks.get(img["id"])) for img in images]
    path = str(root / "shard.bin")
    write_shard(path, spec, recs)
    return path, man, images


def _check_reader(reader_shard, man, images):
    sg = SGDir(man["sg_dir"])
    masks = SGDir(man["mask_dir"])
    ids = reader_shard.image_ids()
    np.testing.assert_array_equal(ids, [img["id"] for img in images])
    for i, img in enumerate(images):
        rec = reader_shard.record(i)
        src = sg.get(img["id"])
        n = min(np.asarray(src["object_fmap"]).shape[0], 36)
        np.testing.assert_allclose(rec["obj_fmap"][:n], src["object_fmap"][:n])
        np.testing.assert_array_equal(rec["rel_ind"][:3], src["rel_ind"][:3])
        mb = masks.get(img["id"])
        entry0 = np.asarray(mb["subgraph_mask_list"][0][1]).nonzero()[0]
        got = rec["sub_obj_ind"][0][rec["sub_att_mask"][0] > 0]
        np.testing.assert_array_equal(np.sort(got), np.sort(entry0))
        assert rec["counts"][0] == n


def test_numpy_reader(shard):
    path, man, images = shard
    _check_reader(PackedShard(path, use_native=False), man, images)


def test_native_reader(shard):
    path, man, images = shard
    s = PackedShard(path, use_native=True)
    if s._native is None:
        pytest.skip("native reader unavailable")
    _check_reader(s, man, images)
    # batched gather returns the raw records contiguously
    g = s._native.gather([2, 0])
    assert g.shape == (2, s.spec.record_size)
    r2 = s._native.record(2)
    np.testing.assert_array_equal(
        np.frombuffer(g[0][:8].tobytes(), np.int64)[0], r2["img_id"])


def test_native_matches_numpy(shard):
    path, man, images = shard
    s_np = PackedShard(path, use_native=False)
    s_nat = PackedShard(path, use_native=True)
    if s_nat._native is None:
        pytest.skip("native reader unavailable")
    for i in range(len(images)):
        a = s_np.record(i)
        b = s_nat.record(i)
        assert a["img_id"] == b["img_id"]
        for key in ["obj_fmap", "obj_dist", "rel_ind", "pred_dist", "boxes",
                    "node_iou", "sub_obj_ind", "sub_att_mask", "sub_pred_ind"]:
            np.testing.assert_array_equal(a[key], b[key])


def test_multi_shard_source(shard, tmp_path):
    """PackedSource spans multiple shards via comma-list."""
    path, man, images = shard
    from subgc_tpu.data.packed import PackedSpec, pack_image, write_shard
    from subgc_tpu.data.packed_adapter import PackedSGSource
    from subgc_tpu.io.sg_npz import SGDir
    # second shard with one extra synthetic image id
    spec = PackedSpec(feat_dim=man["feat_dim"],
                      n_obj_cls=man["n_obj_classes"],
                      n_rel_cls=man["n_rel_classes"], max_subg=16)
    sg = SGDir(man["sg_dir"])
    rec = pack_image(spec, 999999, sg.get(images[0]["id"]), None)
    path2 = str(tmp_path / "shard2.bin")
    write_shard(path2, spec, [rec])

    src = PackedSGSource(f"{path},{path2}")
    got = src.get(999999)
    want = src.get(images[0]["id"])
    np.testing.assert_allclose(got["object_fmap"], want["object_fmap"])
    assert len(src.index) == len(images) + 1


def test_native_reader_rejects_bad_input(shard, tmp_path):
    """Out-of-range gather indices raise (not segfault); corrupt headers
    refuse to open rather than overflow the record-bound check."""
    from subgc_tpu.ops.native_packed import NativePackedReader, _load
    if _load() is None:
        pytest.skip("native packed reader unavailable")
    path, man, images = shard
    r = NativePackedReader(path)

    with pytest.raises(IndexError):
        r.gather([0, len(images) + 7])
    with pytest.raises(IndexError):
        r.record(len(images))
    # valid gather still works after the failed one
    assert r.gather([0, 1]).shape[0] == 2

    # corrupt header: n_images * record_size overflowing past the file size
    blob = bytearray(open(path, "rb").read())
    blob[8:12] = (2**32 - 1).to_bytes(4, "little")          # n_images
    bad = tmp_path / "bad.bin"
    bad.write_bytes(blob)
    with pytest.raises(Exception):
        NativePackedReader(str(bad))

    # truncated file (< header)
    tiny = tmp_path / "tiny.bin"
    tiny.write_bytes(b"short")
    with pytest.raises(Exception):
        NativePackedReader(str(tiny))
