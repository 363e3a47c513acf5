"""Dataset pairing semantics: DNS fileid pairing, VCTK-DEMAND same-name
pairing, DNS test-set sortkey pairing, crop/repeat-pad.

Reference: /root/reference/src/util/dataset.py:51-73,119-134.
"""

import os

import numpy as np
import pytest

from cleanumamba_tpu.data.dataset import CleanNoisyPairDataset, _crop_pair
from cleanumamba_tpu.data.wavio import write_wav

SR = 16000


def _write(path, seed, n=SR // 4):
    rng = np.random.default_rng(seed)
    write_wav(path, rng.normal(size=n).astype(np.float32) * 0.1, SR)


def _make_tree(root, names):
    clean = os.path.join(root, "training_set", "clean")
    noisy = os.path.join(root, "training_set", "noisy")
    os.makedirs(clean)
    os.makedirs(noisy)
    for i, name in enumerate(names):
        _write(os.path.join(clean, name), seed=i)
        _write(os.path.join(noisy, name), seed=1000 + i)


def test_dns_training_pairs_by_fileid(tmp_path):
    _make_tree(str(tmp_path), [f"fileid_{i}.wav" for i in range(4)])
    ds = CleanNoisyPairDataset(str(tmp_path), subset="training",
                               crop_length_sec=0.1, dataset="dns")
    assert len(ds) == 4
    for i, (c, n) in enumerate(ds.pairs):
        assert c.endswith(f"clean/fileid_{i}.wav")
        assert n.endswith(f"noisy/fileid_{i}.wav")
    clean, noisy = ds[0]
    assert clean.shape == noisy.shape == (int(0.1 * SR),)


def test_vctk_demand_pairs_by_name(tmp_path):
    names = ["p232_001.wav", "p232_005.wav", "p257_010.wav"]
    _make_tree(str(tmp_path), names)
    ds = CleanNoisyPairDataset(str(tmp_path), subset="training",
                               crop_length_sec=0.1, dataset="VCTK-DEMAND")
    assert len(ds) == 3
    for (c, n), name in zip(ds.pairs, sorted(names)):
        assert os.path.basename(c) == name and os.path.basename(n) == name
    clean, noisy = ds[1]
    assert clean.shape == noisy.shape


def test_unknown_variant_raises(tmp_path):
    _make_tree(str(tmp_path), ["fileid_0.wav"])
    with pytest.raises(ValueError, match="dataset variant"):
        CleanNoisyPairDataset(str(tmp_path), dataset="librispeech")


def test_dns_mismatched_counts_raise(tmp_path):
    _make_tree(str(tmp_path), ["fileid_0.wav", "fileid_1.wav"])
    os.remove(os.path.join(str(tmp_path), "training_set", "noisy", "fileid_1.wav"))
    with pytest.raises(ValueError, match="counts differ"):
        CleanNoisyPairDataset(str(tmp_path), subset="training", dataset="dns")


def test_testing_sortkey_pairing(tmp_path):
    base = os.path.join(str(tmp_path), "datasets", "test_set", "synthetic", "no_reverb")
    os.makedirs(os.path.join(base, "clean"))
    os.makedirs(os.path.join(base, "noisy"))
    # DNS test naming: shared trailing fileid, different prefixes
    for i, fid in enumerate([3, 11, 2]):
        _write(os.path.join(base, "clean", f"clean_fileid_{fid}.wav"), seed=i)
        _write(os.path.join(base, "noisy", f"noisy_snr10_fileid_{fid}.wav"), seed=100 + i)
    ds = CleanNoisyPairDataset(str(tmp_path), subset="testing")
    fids = [os.path.basename(c).split("_")[-1] for c, _ in ds.pairs]
    assert fids == ["2.wav", "3.wav", "11.wav"]  # numeric sortkey order
    for c, n in ds.pairs:
        assert c.split("_")[-1] == n.split("_")[-1]


def test_crop_repeat_pads_short_clips():
    rng = np.random.default_rng(0)
    clean = rng.normal(size=100).astype(np.float32)
    noisy = rng.normal(size=100).astype(np.float32)
    c, n = _crop_pair(clean, noisy, 250, rng)
    assert c.shape == n.shape == (250,)
    np.testing.assert_array_equal(c[:100], clean)
    np.testing.assert_array_equal(c[100:200], clean)
    np.testing.assert_array_equal(c[200:], clean[:50])


def test_train_config_parses_dataset_variant(tmp_path):
    """trainset_config "dataset" reaches TrainConfig (reference config key
    that selects the VCTK-DEMAND layout, dataset.py:51-54)."""
    import json

    from cleanumamba_tpu.config import load_train_config

    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps({
        "train_config": {},
        "trainset_config": {"root": "/x", "dataset": "VCTK-DEMAND"},
    }))
    tc = load_train_config(str(cfg_path))
    assert tc.dataset == "VCTK-DEMAND"
    assert load_train_config.__module__  # sanity
