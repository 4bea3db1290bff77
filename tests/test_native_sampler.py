"""C++ pos/neg sub-graph sampler: semantic invariants + distribution parity
vs the python reference implementation (data.dataset.sample_pos_neg).

The native sampler replicates the reference's branching and weights
(dataloader.py:229-266) with its own RNG (distribution parity, not
numpy-stream parity — the documented training-RNG stance, SURVEY.md §7).
"""
import numpy as np
import pytest

from subgc_tpu.data.dataset import sample_pos_neg
from subgc_tpu.ops import native

THRES, HALF, SPI = 0.75, 2, 5


def _bank(rng, n_sub=24):
    """node_iou [5, 5+n_sub] with a mix of pos-rich/pos-poor sentences."""
    m = rng.rand(SPI, 5 + n_sub).astype(np.float32) * 0.7
    m[:, :5] = np.eye(SPI) * 0.3 + 0.7
    m[0, 5:12] = 0.8 + rng.rand(7) * 0.2      # many positives
    m[1, 5:6] = 0.9                            # one positive (GT-pad branch)
    # sentence 2: zero positives (full GT-pad), 3: all-pos edge, 4: mixed
    m[3, 5:] = 0.76 + rng.rand(n_sub) * 0.2
    m[4, 5:9] = 0.85
    return m


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_sampler_invariants():
    rng = np.random.RandomState(0)
    bank = _bank(rng)
    sampled = bank[:, 5:]
    pos_cols = set((sampled >= THRES).nonzero()[1].tolist())
    # pure negatives: < thres AND not positive for any sentence
    pure_neg = (sampled < THRES) & ~np.isin(np.arange(sampled.shape[1]),
                                            list(pos_cols))[None, :]
    for seed in range(50):
        out = native.sample_pos_neg_native(bank, THRES, HALF, SPI, seed)
        assert out.shape == (SPI, HALF, 2)
        for i in range(SPI):
            n_pos = int((sampled[i] >= THRES).sum())
            for k in range(HALF):
                p, ng = int(out[i, k, 0]), int(out[i, k, 1])
                if n_pos >= HALF or k >= HALF - n_pos:
                    # a sampled positive: iou >= thres
                    assert p >= 5 and sampled[i, p - 5] >= THRES, (i, k, p)
                else:
                    assert p == i, (i, k, p)     # GT-noun sub-graph slot
                # negatives: pure-negative columns when enough exist
                # (else the reference falls back to any <= thres column,
                # then to any column at all only if none are <= thres)
                assert ng >= 5
                if pure_neg[i].sum() >= HALF:
                    assert pure_neg[i, ng - 5], (i, k, ng)
                elif (sampled[i] <= THRES).any():
                    assert sampled[i, ng - 5] <= THRES, (i, k, ng)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_sampler_distribution_matches_python():
    rng = np.random.RandomState(1)
    bank = _bank(rng)
    n_draws = 4000

    counts_py = np.zeros((SPI, 5 + bank.shape[1]))
    counts_cc = np.zeros_like(counts_py)
    py_rng = np.random.RandomState(7)
    for d in range(n_draws):
        out = sample_pos_neg(bank, THRES, HALF, SPI, py_rng)
        for i in range(SPI):
            for k in range(HALF):
                counts_py[i, out[i, k, 0]] += 1
        out = native.sample_pos_neg_native(bank, THRES, HALF, SPI, seed=d)
        for i in range(SPI):
            for k in range(HALF):
                counts_cc[i, out[i, k, 0]] += 1

    # positive-pick frequencies agree within 3% absolute per slot
    f_py = counts_py / (n_draws * HALF)
    f_cc = counts_cc / (n_draws * HALF)
    np.testing.assert_allclose(f_cc, f_py, atol=0.03)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_sampler_short_matrix_falls_back():
    """Fewer stored rows than seq_per_img -> None (python fallback), never
    an out-of-bounds read (ADVICE r2)."""
    rng = np.random.RandomState(3)
    short = _bank(rng)[:SPI - 2]
    assert native.sample_pos_neg_native(short, THRES, HALF, SPI, seed=0) is None


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_sampler_extra_rows_affect_weights():
    """Rows beyond seq_per_img still contribute to the column weight sums,
    matching sample_pos_neg's full-matrix pos_mask.sum(0) (ADVICE r2)."""
    rng = np.random.RandomState(5)
    bank = _bank(rng, n_sub=16)
    extra = np.concatenate([bank, np.full((2, bank.shape[1]), 0.9,
                                          np.float32)], axis=0)
    n_draws = 4000
    counts_py = np.zeros(extra.shape[1])
    counts_cc = np.zeros_like(counts_py)
    py_rng = np.random.RandomState(11)
    for d in range(n_draws):
        out = sample_pos_neg(extra, THRES, HALF, SPI, py_rng)
        for k in range(HALF):
            counts_py[out[0, k, 0]] += 1
        out = native.sample_pos_neg_native(extra, THRES, HALF, SPI, seed=d)
        assert out.shape == (SPI, HALF, 2)
        for k in range(HALF):
            counts_cc[out[0, k, 0]] += 1
    np.testing.assert_allclose(counts_cc / (n_draws * HALF),
                               counts_py / (n_draws * HALF), atol=0.03)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_loader_native_vs_python_sampler(tmp_path):
    """Both sampler backends produce structurally valid, equal-shaped
    batches through the TrainLoader."""
    import jax.numpy as jnp  # noqa: F401  (jax already configured by conftest)

    from subgc_tpu.config import DataConfig, ModelConfig, TrainConfig
    from subgc_tpu.data.dataset import TrainLoader
    from subgc_tpu.data.synthetic import generate_dataset

    man = generate_dataset(str(tmp_path / "d"), n_images=8, seed=4,
                           vocab_size=20)
    mcfg = ModelConfig(vocab_size=man["vocab_size"], rnn_size=16,
                       input_encoding_size=12, att_hid_size=8, gcn_dim=8,
                       fc_feat_size=12, att_feat_size=man["feat_dim"],
                       embed_dim=8, num_obj_classes=man["n_obj_classes"],
                       num_rel_classes=man["n_rel_classes"])
    dcfg = DataConfig(input_json=man["input_json"],
                      input_label_h5=man["input_label_h5"],
                      sg_dir=man["sg_dir"], mask_dir=man["mask_dir"])
    tcfg = TrainConfig(batch_size=4)
    for use_native in (True, False):
        loader = TrainLoader(mcfg, tcfg, dcfg, native_sampler=use_native)
        batch, infos, _ = loader.get_batch("train")
        assert batch.sub_obj_ind.shape == (20, 2, 2, mcfg.obj_num)
        assert np.asarray(batch.sub_att_mask).sum() > 0
