import numpy as np
import jax.numpy as jnp
import pytest

from srba_slam_tpu.models.bow import BoWDatabase, Vocabulary
from srba_slam_tpu.ops import bits as bitops


def _rand_packed(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32))


def _flip_bits(rng, desc, k):
    bits = np.asarray(bitops.unpack_bits(desc)).copy()
    for i in range(bits.shape[0]):
        idx = rng.choice(256, size=k, replace=False)
        bits[i, idx] ^= 1
    return bitops.pack_bits(jnp.asarray(bits))


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    train = np.asarray(
        rng.integers(0, 2**32, size=(2000, 8), dtype=np.uint64).astype(np.uint32)
    )
    return Vocabulary.train(train, k=4, L=3, seed=1)


def test_train_vocabulary(voc):
    assert voc.n_words > 10
    assert voc.n_pad % 128 == 0
    assert (voc.weights[: voc.n_words] > 0).all()
    assert voc.weights[voc.n_words:].sum() == 0


def test_bow_vector_normalized(voc):
    rng = np.random.default_rng(2)
    db = BoWDatabase(voc, max_kfs=16)
    desc = _rand_packed(rng, 64)
    v = np.asarray(db.compute_bow(desc, jnp.ones(64, bool)))
    assert abs(v.sum() - 1.0) < 1e-5
    assert (v >= 0).all()


def test_self_query_is_top_with_score_1(voc):
    rng = np.random.default_rng(3)
    db = BoWDatabase(voc, max_kfs=16)
    frames = [_rand_packed(rng, 64) for _ in range(5)]
    valid = jnp.ones(64, bool)
    for f in frames:
        db.insert(f, valid)
    s, i = db.query(frames[2], valid, max_results=4)
    assert i[0] == 2
    np.testing.assert_allclose(s[0], 1.0, atol=1e-5)
    assert s[1] <= s[0]


def test_noisy_revisit_ranks_first(voc):
    rng = np.random.default_rng(4)
    db = BoWDatabase(voc, max_kfs=16)
    frames = [_rand_packed(rng, 64) for _ in range(6)]
    valid = jnp.ones(64, bool)
    for f in frames:
        db.insert(f, valid)
    noisy = _flip_bits(rng, frames[1], 10)  # revisit of KF 1 with noise
    s, i = db.query(noisy, valid, max_results=3)
    assert i[0] == 1
    assert s[0] > s[1] + 0.05


def test_query_ignores_unfilled_slots(voc):
    rng = np.random.default_rng(5)
    db = BoWDatabase(voc, max_kfs=16)
    db.insert(_rand_packed(rng, 64), jnp.ones(64, bool))
    s, i = db.query(_rand_packed(rng, 64), jnp.ones(64, bool), max_results=4)
    assert i[0] == 0
    assert (s[1:] == -1.0).all()  # only one stored KF


def test_entry_id_equals_kf_id(voc):
    rng = np.random.default_rng(6)
    db = BoWDatabase(voc, max_kfs=8)
    ids = [db.insert(_rand_packed(rng, 32), jnp.ones(32, bool)) for _ in range(4)]
    assert ids == [0, 1, 2, 3]


def test_load_reference_vocabulary_smoke():
    # full parse of the 14MB reference vocabulary; structure checks
    voc = Vocabulary.load_dbow2("/root/reference/demo/voc.yml.gz")
    assert voc.k == 8 and voc.L == 5
    assert voc.n_words == 32273
    assert voc.leaf_bits.shape[1] == 256
    # leaf weights are idf-like: positive for most words
    assert (voc.weights[: voc.n_words] >= 0).all()
    assert (voc.weights[: voc.n_words] > 0).mean() > 0.9
    # descriptors are proper bit arrays
    assert set(np.unique(voc.leaf_bits)) <= {0, 1}
